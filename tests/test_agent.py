"""SAM3 agent loop tests (reference sam3/agent/agent_core.py semantics:
tool protocol, duplicate-prompt rejection, per-mask verification,
message pruning with the ≤2-image budget)."""

import json

import numpy as np
import pytest

from skix.agent import (AgentError, ScriptedLLM, agent_inference,
                        count_images, mask_iom, parse_tool_call,
                        remove_overlapping_masks, render_set_of_marks,
                        render_zoom_in)


def tool(name, **params):
    return f"thinking...\n<tool>{json.dumps({'name': name, 'parameters': params})}</tool>"


def make_masks(hw=(48, 64)):
    """Three disjoint rectangular masks."""
    H, W = hw
    masks = np.zeros((3, H, W), bool)
    masks[0, 5:15, 5:20] = True
    masks[1, 20:40, 10:30] = True
    masks[2, 8:18, 40:60] = True
    return masks


class FakeSegmenter:
    """prompt → canned outputs; records calls."""

    def __init__(self, by_prompt):
        self.by_prompt = by_prompt
        self.calls = []

    def __call__(self, image, prompt):
        self.calls.append(prompt)
        H, W = image.shape[:2]
        masks = self.by_prompt.get(prompt, np.zeros((0, H, W), bool))
        n = len(masks)
        return {"orig_img_h": H, "orig_img_w": W,
                "pred_boxes": [[0.1, 0.1, 0.2, 0.2]] * n,
                "pred_scores": [0.9 - 0.1 * i for i in range(n)],
                "pred_masks": list(masks)}


class TestToolParse:
    def test_first_block_only_and_brace_fix(self):
        name, params = parse_tool_call(
            'x <tool>{"name": "segment_phrase", "parameters": '
            '{"text_prompt": "skier"}}}</tool> <tool>junk</tool>')
        assert name == "segment_phrase"
        assert params == {"text_prompt": "skier"}

    def test_triple_brace_inside_string_param_survives(self):
        """The stray-brace fixup must not corrupt VALID payloads whose
        string content contains '}}}' (code-review finding)."""
        name, params = parse_tool_call(
            '<tool>{"name": "segment_phrase", "parameters": '
            '{"text_prompt": "the }}} sign"}}</tool>')
        assert params == {"text_prompt": "the }}} sign"}

    def test_missing_tool_raises(self):
        with pytest.raises(AgentError):
            parse_tool_call("no tools here")

    def test_missing_parameter_raises_agent_error(self):
        """Malformed tool calls must surface as AgentError (the loop's
        documented contract), not raw KeyError."""
        img = np.zeros((16, 16, 3), np.uint8)
        llm = ScriptedLLM([tool("segment_phrase")])   # no text_prompt
        with pytest.raises(AgentError, match="text_prompt"):
            agent_inference(img, "q", llm, FakeSegmenter({}))
        llm2 = ScriptedLLM([
            tool("segment_phrase", text_prompt="skier"),
            tool("select_masks_and_return"),          # no indices
        ])
        with pytest.raises(AgentError, match="final_answer_masks"):
            agent_inference(img, "q", llm2,
                            FakeSegmenter({"skier": make_masks((16, 16))}))


class TestSom:
    def test_mask_iom_oracle(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(size=(3, 16, 16)) > 0.5
        b = rng.uniform(size=(2, 16, 16)) > 0.5
        got = mask_iom(a, b)
        for i in range(3):
            for j in range(2):
                inter = np.count_nonzero(a[i] & b[j])
                mn = max(min(a[i].sum(), b[j].sum()), 1)
                assert got[i, j] == pytest.approx(inter / (mn + 1e-8),
                                                  rel=1e-5)

    def test_overlap_removal_greedy(self):
        m = np.zeros((3, 10, 10), bool)
        m[0, :5, :5] = True             # score 0.9
        m[1, :5, :5] = True             # duplicate, score 0.5 → dropped
        m[2, 6:, 6:] = True             # disjoint, kept
        keep = remove_overlapping_masks([0.9, 0.5, 0.7], m, 0.3)
        assert keep == [0, 2]

    def test_overlap_removal_keeps_higher_score(self):
        m = np.zeros((2, 10, 10), bool)
        m[0, :5, :5] = True
        m[1, :5, :5] = True
        assert remove_overlapping_masks([0.2, 0.8], m) == [1]

    def test_renders_shapes(self):
        img = np.random.default_rng(1).integers(
            0, 255, (48, 64, 3)).astype(np.uint8)
        masks = make_masks()
        som = render_set_of_marks(img, list(masks))
        assert som.shape == img.shape and som.dtype == np.uint8
        zoom = render_zoom_in(img, masks[0])
        assert zoom.ndim == 3 and max(zoom.shape[:2]) == 512

    def test_zoom_empty_mask_falls_back_to_full_image(self):
        img = np.zeros((30, 40, 3), np.uint8)
        zoom = render_zoom_in(img, np.zeros((30, 40), bool))
        assert zoom.ndim == 3  # no crash on empty mask


class TestAgentLoop:
    def test_happy_path_select(self):
        img = np.zeros((48, 64, 3), np.uint8)
        seg = FakeSegmenter({"skier": make_masks()})
        llm = ScriptedLLM([
            tool("segment_phrase", text_prompt="skier"),
            tool("select_masks_and_return", final_answer_masks=[1, 3]),
        ])
        msgs, final, rendered = agent_inference(img, "the skiers", llm, seg)
        assert len(final["pred_masks"]) == 2
        assert final["pred_scores"] == [0.9, 0.7]
        assert rendered.shape == img.shape
        # every LLM call saw at most 2 images
        assert all(count_images(m) <= 2 for m in llm.seen)

    def test_examine_each_mask_filters(self):
        img = np.zeros((48, 64, 3), np.uint8)
        seg = FakeSegmenter({"skier": make_masks()})
        llm = ScriptedLLM([
            tool("segment_phrase", text_prompt="skier"),
            tool("examine_each_mask"),
            "<verdict>Accept</verdict>",     # mask 1
            "<verdict>Reject</verdict>",     # mask 2
            "<verdict>Accept</verdict>",     # mask 3
            tool("select_masks_and_return", final_answer_masks=[1, 2]),
        ])
        msgs, final, _ = agent_inference(img, "skiers", llm, seg)
        # 3 masks → keep 1 and 3 → select renumbered 1, 2 → both kept
        assert len(final["pred_masks"]) == 2
        assert final["pred_scores"] == [0.9, 0.7]

    def test_duplicate_prompt_then_retry(self):
        img = np.zeros((32, 32, 3), np.uint8)
        seg = FakeSegmenter({"skier": make_masks((32, 32)),
                             "person": make_masks((32, 32))[:1]})
        llm = ScriptedLLM([
            tool("segment_phrase", text_prompt="skier"),
            tool("segment_phrase", text_prompt="skier"),  # duplicate
            tool("segment_phrase", text_prompt="person"),
            tool("select_masks_and_return", final_answer_masks=[1]),
        ])
        _, final, _ = agent_inference(img, "q", llm, seg)
        assert seg.calls == ["skier", "person"]  # dup never re-ran
        assert len(final["pred_masks"]) == 1
        # the retry request message carried the duplicate warning
        dup_round = llm.seen[2]
        assert any("may not be reused" in c.get("text", "")
                   for m in dup_round if isinstance(m.get("content"), list)
                   for c in m["content"] if isinstance(c, dict))

    def test_no_masks_then_new_prompt_warning_pruned_in(self):
        img = np.zeros((32, 32, 3), np.uint8)
        seg = FakeSegmenter({"snow": make_masks((32, 32))})
        llm = ScriptedLLM([
            tool("segment_phrase", text_prompt="ice"),    # 0 masks
            tool("segment_phrase", text_prompt="snow"),
            tool("select_masks_and_return", final_answer_masks=[2]),
        ])
        _, final, _ = agent_inference(img, "the slope", llm, seg)
        assert len(final["pred_masks"]) == 1
        # after the second segment call, pruning injects the
        # previously-tried-prompts warning into message 2
        last_seen = llm.seen[-1]
        assert any("never reuse any of" in c.get("text", "").lower()
                   or "ice" in c.get("text", "")
                   for m in last_seen if isinstance(m.get("content"), list)
                   for c in m["content"] if isinstance(c, dict))

    def test_repeated_examine_rounds_complete(self):
        """Three consecutive examine_each_mask rounds are a legitimate
        sequence — the history must compress, not hard-fail (code-review
        finding: the old <10-entry guard raised on the 3rd round)."""
        img = np.zeros((48, 64, 3), np.uint8)
        seg = FakeSegmenter({"skier": make_masks()})
        llm = ScriptedLLM([
            tool("segment_phrase", text_prompt="skier"),
            tool("examine_each_mask"),
            "<verdict>Accept</verdict>", "<verdict>Accept</verdict>",
            "<verdict>Accept</verdict>",
            tool("examine_each_mask"),
            "<verdict>Accept</verdict>", "<verdict>Accept</verdict>",
            "<verdict>Accept</verdict>",
            tool("examine_each_mask"),
            "<verdict>Accept</verdict>", "<verdict>Reject</verdict>",
            "<verdict>Accept</verdict>",
            tool("select_masks_and_return", final_answer_masks=[1, 2]),
        ])
        _, final, _ = agent_inference(img, "skiers", llm, seg)
        assert len(final["pred_masks"]) == 2
        # the ≤2-image budget applies to MAIN-loop conversations; the
        # per-mask verifier conversations carry 3 by design (raw +
        # overlay + zoom, like the reference's iterative checking)
        from skix.agent.prompts import SYSTEM_PROMPT
        main = [m for m in llm.seen if m[0].get("content") == SYSTEM_PROMPT]
        assert main and all(count_images(m) <= 2 for m in main)

    def test_segmenter_client_zero_masks(self):
        """Sam3AgentClient must return an empty outputs dict (not crash)
        when nothing clears the confidence threshold (code-review
        finding: reshape(-1) on an empty array raises)."""
        from skix.agent import Sam3AgentClient

        class EmptyProcessor:
            def set_image(self, image):
                return {}

            def set_text_prompt(self, prompt, state):
                return {"boxes_xyxy": np.zeros((0, 4), np.float32),
                        "scores": np.zeros((0,), np.float32),
                        "masks_lowres": np.zeros((0, 4, 4), np.float32)}

        out = Sam3AgentClient(EmptyProcessor())(
            np.zeros((24, 32, 3), np.uint8), "unicorn")
        assert out["pred_masks"] == [] and out["pred_boxes"] == []

    def test_report_no_mask(self):
        img = np.zeros((20, 30, 3), np.uint8)
        seg = FakeSegmenter({})
        llm = ScriptedLLM([tool("report_no_mask")])
        msgs, final, rendered = agent_inference(img, "a unicorn", llm, seg)
        assert final["pred_masks"] == [] and final["pred_boxes"] == []
        assert final["orig_img_h"] == 20 and final["orig_img_w"] == 30
        assert rendered.shape == img.shape

    def test_first_call_must_segment_or_report(self):
        llm = ScriptedLLM([tool("examine_each_mask")])
        with pytest.raises(AgentError):
            agent_inference(np.zeros((8, 8, 3), np.uint8), "q", llm,
                            FakeSegmenter({}))

    def test_llm_none_raises(self):
        llm = ScriptedLLM([])
        with pytest.raises(AgentError):
            agent_inference(np.zeros((8, 8, 3), np.uint8), "q", llm,
                            FakeSegmenter({}))

    def test_max_generations_guard(self):
        img = np.zeros((16, 16, 3), np.uint8)
        seg = FakeSegmenter({})  # every prompt → 0 masks
        llm = ScriptedLLM([tool("segment_phrase", text_prompt=f"p{i}")
                           for i in range(10)])
        with pytest.raises(AgentError, match="max_generations"):
            agent_inference(img, "q", llm, seg, max_generations=3)

    def test_select_invalid_indices_filtered(self):
        img = np.zeros((32, 32, 3), np.uint8)
        seg = FakeSegmenter({"skier": make_masks((32, 32))})
        llm = ScriptedLLM([
            tool("segment_phrase", text_prompt="skier"),
            tool("select_masks_and_return",
                 final_answer_masks=[3, 3, 99, 1]),
        ])
        _, final, _ = agent_inference(img, "q", llm, seg)
        assert len(final["pred_masks"]) == 2          # 1 and 3, deduped
        assert final["pred_scores"] == [0.9, 0.7]     # ascending order


class TestSam3AgentClient:
    def test_segment_on_tiny_detector(self):
        """End-to-end: Sam3AgentClient wraps the real Sam3Processor on a
        tiny random-weight detector (smoke scale, CPU)."""
        from skix.agent import Sam3AgentClient
        from skix.tracking.image_processor import Sam3Processor
        from skix.tracking.sam3_detector import Sam3Detector

        det = Sam3Detector.tiny(d_model=64)
        proc = Sam3Processor(det, confidence_threshold=0.0)
        client = Sam3AgentClient(proc, min_mask_area=1)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
        out = client(img, "person")
        assert out["orig_img_h"] == 96 and out["orig_img_w"] == 128
        n = len(out["pred_masks"])
        assert len(out["pred_boxes"]) == n == len(out["pred_scores"])
        if n:
            assert out["pred_masks"][0].shape == (96, 128)
            assert out["pred_masks"][0].dtype == bool
            # scores sorted descending
            s = out["pred_scores"]
            assert all(s[i] >= s[i + 1] for i in range(len(s) - 1))

    def test_save_outputs_rle_roundtrip(self, tmp_path):
        from skix.agent.client import save_outputs
        from skix.io.coco_export import rle_to_mask

        masks = make_masks((24, 32))
        out = {"orig_img_h": 24, "orig_img_w": 32,
               "pred_boxes": [[0, 0, 1, 1]] * 3,
               "pred_scores": [0.9, 0.8, 0.7],
               "pred_masks": list(masks)}
        path = save_outputs(out, str(tmp_path / "o.json"))
        loaded = json.load(open(path))
        rec = np.stack([rle_to_mask(r) for r in loaded["pred_masks"]])
        assert (rec == masks).all()
