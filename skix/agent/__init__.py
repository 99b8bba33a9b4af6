"""SAM3 agent: an MLLM drives the open-vocabulary segmenter as a tool
(reference ``sam3/agent/`` — SURVEY.md §2.8 "Agent" row)."""

from skix.agent.client import LLMClient, Sam3AgentClient, ScriptedLLM
from skix.agent.core import (AgentError, agent_inference, count_images,
                             parse_tool_call, prune_messages)
from skix.agent.som import (mask_iom, remove_overlapping_masks,
                            render_set_of_marks, render_zoom_in)

__all__ = [
    "AgentError", "LLMClient", "Sam3AgentClient", "ScriptedLLM",
    "agent_inference", "count_images", "mask_iom", "parse_tool_call",
    "prune_messages", "remove_overlapping_masks", "render_set_of_marks",
    "render_zoom_in",
]
