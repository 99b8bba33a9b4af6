"""Tracking subsystem tests: lifecycle scan, detector, session API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking import (
    DetrDetector,
    TrackerConfig,
    VideoPredictor,
    init_tracker_state,
    track_sequence,
    tracker_step,
)

rng = np.random.default_rng(71)


def det_frame(boxes, scores, N=8):
    b = np.zeros((N, 4), np.float32)
    s = np.zeros(N, np.float32)
    v = np.zeros(N, bool)
    for i, (bb, sc) in enumerate(zip(boxes, scores)):
        b[i] = bb
        s[i] = sc
        v[i] = True
    return b, s, v


class TestLifecycle:
    def test_spawn_and_confirm(self):
        cfg = TrackerConfig(max_objects=4, min_hits_to_confirm=3)
        state = init_tracker_state(cfg)
        box = [10.0, 10, 30, 40]
        for t in range(3):
            b, s, v = det_frame([box], [0.9])
            state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                      jnp.asarray(v), cfg)
        assert int(jnp.sum(out["active"])) == 1
        slot = int(jnp.argmax(out["active"]))
        assert bool(out["confirmed"][slot])
        assert int(out["obj_id"][slot]) == 0

    def test_identity_maintained_while_moving(self):
        cfg = TrackerConfig(max_objects=4)
        T = 20
        boxes = np.zeros((T, 8, 4), np.float32)
        scores = np.zeros((T, 8), np.float32)
        valid = np.zeros((T, 8), bool)
        for t in range(T):
            x = 10 + 3 * t
            boxes[t, 0] = [x, 10, x + 20, 50]
            scores[t, 0] = 0.9
            valid[t, 0] = True
        outs = track_sequence(boxes, scores, valid, cfg)
        ids = np.asarray(outs["obj_id"])
        act = np.asarray(outs["active"])
        slot = np.argmax(act[0])
        assert np.all(act[:, slot])
        assert np.all(ids[:, slot] == ids[0, slot])

    def test_occlusion_tolerance_and_kill(self):
        cfg = TrackerConfig(max_objects=4, max_time_since_update=3,
                            keep_alive_decay=0.95, keep_alive_min=0.1)
        state = init_tracker_state(cfg)
        box = [10.0, 10, 30, 40]
        for _ in range(3):
            b, s, v = det_frame([box], [0.9])
            state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                      jnp.asarray(v), cfg)
        # 2 frames of occlusion: survives
        b, s, v = det_frame([], [])
        for _ in range(2):
            state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                      jnp.asarray(v), cfg)
        assert int(jnp.sum(out["active"])) == 1
        # reappears at a close location and re-associates with the SAME id
        b, s, v = det_frame([[12.0, 11, 32, 41]], [0.9])
        state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                  jnp.asarray(v), cfg)
        assert int(jnp.sum(out["active"])) == 1
        assert int(out["obj_id"][int(jnp.argmax(out["active"]))]) == 0
        # long occlusion: killed
        b, s, v = det_frame([], [])
        for _ in range(5):
            state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                      jnp.asarray(v), cfg)
        assert int(jnp.sum(out["active"])) == 0

    def test_two_objects_two_ids(self):
        cfg = TrackerConfig(max_objects=4)
        state = init_tracker_state(cfg)
        for _ in range(3):
            b, s, v = det_frame([[10.0, 10, 30, 40], [200.0, 200, 240, 260]],
                                [0.9, 0.8])
            state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                      jnp.asarray(v), cfg)
        ids = np.asarray(out["obj_id"])[np.asarray(out["active"])]
        assert len(ids) == 2 and len(set(ids.tolist())) == 2

    def test_duplicate_suppression(self):
        cfg = TrackerConfig(max_objects=4, duplicate_iou_threshold=0.6,
                            min_hits_to_confirm=1)
        state = init_tracker_state(cfg)
        # spawn two near-identical tracks by feeding two duplicate dets
        # in the first frame (IoU < match thresh with nothing to match)
        b, s, v = det_frame([[10.0, 10, 30, 40], [11.0, 10, 31, 40]],
                            [0.9, 0.7])
        state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                  jnp.asarray(v), cfg)
        # next frame resolves duplicates: the weaker one is suppressed
        b, s, v = det_frame([[10.0, 10, 30, 40]], [0.9])
        state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                  jnp.asarray(v), cfg)
        assert int(jnp.sum(out["active"])) == 1
        assert float(out["keep_alive"][int(jnp.argmax(out["active"]))]) >= 0.89

    def test_low_score_does_not_spawn(self):
        cfg = TrackerConfig(max_objects=4, det_score_threshold=0.5)
        state = init_tracker_state(cfg)
        b, s, v = det_frame([[10.0, 10, 30, 40]], [0.3])
        state, out = tracker_step(state, jnp.asarray(b), jnp.asarray(s),
                                  jnp.asarray(v), cfg)
        assert int(jnp.sum(out["active"])) == 0

    def test_whole_clip_jit(self):
        cfg = TrackerConfig(max_objects=4)
        T = 12
        boxes = np.tile(np.array([10.0, 10, 30, 40], np.float32), (T, 8, 1))
        scores = np.zeros((T, 8), np.float32)
        scores[:, 0] = 0.9
        valid = np.zeros((T, 8), bool)
        valid[:, 0] = True
        fn = jax.jit(lambda b, s, v: track_sequence(b, s, v, cfg))
        outs = fn(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
        assert np.asarray(outs["active"]).shape == (T, 4)


class TestDetector:
    def test_forward(self):
        det = DetrDetector(img_size=64, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, num_queries=5, decoder_depth=1,
                           prompt_dim=16)
        imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        prompt = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
        v = det.init(jax.random.PRNGKey(0), imgs, prompt)
        out = det.apply(v, imgs, prompt)
        assert out.boxes_xyxy.shape == (2, 5, 4)
        assert out.scores.shape == (2, 5)
        assert float(jnp.min(out.scores)) >= 0 and float(jnp.max(out.scores)) <= 1
        b = np.asarray(out.boxes_xyxy)
        assert np.all(b[..., 2] >= b[..., 0]) and np.all(b[..., 3] >= b[..., 1])

    def test_prompt_changes_scores(self):
        from skix.tracking.detector import embed_text_prompt

        det = DetrDetector(img_size=64, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, num_queries=5, decoder_depth=1,
                           prompt_dim=16)
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        p1 = embed_text_prompt("person", 16)[None]
        p2 = embed_text_prompt("snow", 16)[None]
        v = det.init(jax.random.PRNGKey(0), imgs, p1)
        s1 = det.apply(v, imgs, p1).scores
        s2 = det.apply(v, imgs, p2).scores
        assert not np.allclose(np.asarray(s1), np.asarray(s2))
        # embeddings near-orthogonal
        assert abs(float(jnp.dot(p1[0], p2[0]))) < 0.5


class TestSession:
    def test_full_protocol(self):
        det = DetrDetector(img_size=32, patch_size=16, embed_dim=32, depth=1,
                           num_heads=2, num_queries=4, decoder_depth=1,
                           prompt_dim=16)
        pred = VideoPredictor(det, tracker_cfg=TrackerConfig(
            max_objects=4, det_score_threshold=0.0, min_hits_to_confirm=1),
            batch_size=2)
        frames = rng.integers(0, 255, (5, 48, 64, 3)).astype(np.uint8)
        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        outs = list(pred.propagate_in_video(sid))
        assert len(outs) == 5
        assert outs[0]["frame_index"] == 0
        assert outs[-1]["frame_index"] == 4
        assert outs[0]["outputs"]["bbox"].shape == (4, 4)
        stats = pred.session_stats(sid)
        assert stats == {"frames": 5, "prompts": ["person"],
                         "removed_ids": [], "geometry_frames": []}
        # second prompt + reset + close
        pred.add_prompt(sid, "snow")
        pred.reset_session(sid)
        assert pred.session_stats(sid)["prompts"] == []
        pred.close_session(sid)
        assert sid not in pred.sessions

    def test_dict_request_protocol(self):
        """The reference pipeline drives sessions through the dict
        request protocol (prepare_front_results.py:58-129 — start,
        person prompt, propagate, reset, snow prompt, propagate, close).
        The adapter must accept that exact request sequence, including
        xywh bounding_boxes and resource-free 'frames' start."""
        det = DetrDetector(img_size=32, patch_size=16, embed_dim=32, depth=1,
                           num_heads=2, num_queries=4, decoder_depth=1,
                           prompt_dim=16)
        pred = VideoPredictor(det, tracker_cfg=TrackerConfig(
            max_objects=4, det_score_threshold=0.0, min_hits_to_confirm=1),
            batch_size=2)
        frames = rng.integers(0, 255, (4, 48, 64, 3)).astype(np.uint8)
        sid = pred.handle_request({"type": "start_session",
                                   "frames": frames})["session_id"]
        r = pred.handle_request({"type": "add_prompt", "session_id": sid,
                                 "text": "person", "frame_index": 0})
        assert r == {"frame_index": 0}
        outs = list(pred.handle_stream_request(
            {"type": "propagate_in_video", "session_id": sid,
             "text": "person"}))
        # protocol default direction is "both" (reference :95): forward
        # [0..T) then backward from frame 0 re-yields frame 0
        assert [o["frame_index"] for o in outs] == [0, 1, 2, 3, 0]
        assert outs[0]["outputs"]["bbox"].shape == (4, 4)
        pred.handle_request({"type": "reset_session", "session_id": sid})
        pred.handle_request({"type": "add_prompt", "session_id": sid,
                             "text": "snow", "frame_index": 0})
        outs2 = list(pred.handle_stream_request(
            {"type": "propagate_in_video", "session_id": sid,
             "text": "snow", "propagation_direction": "forward"}))
        assert len(outs2) == 4
        pred.handle_request({"type": "close_session", "session_id": sid})
        assert sid not in pred.sessions
        with pytest.raises(RuntimeError):
            pred.handle_request({"type": "nonsense"})

    def test_directioned_propagation_from_mid_clip(self):
        """A mid-clip prompt propagates forward AND backward
        (reference sam3_video_predictor.py:203-220): forward covers
        [s0, s0+max), backward walks s0 → 0 reverse in time, each
        restarting tracking at the prompted frame."""
        det = DetrDetector(img_size=32, patch_size=16, embed_dim=32, depth=1,
                           num_heads=2, num_queries=4, decoder_depth=1,
                           prompt_dim=16)
        pred = VideoPredictor(det, tracker_cfg=TrackerConfig(
            max_objects=4, det_score_threshold=0.0, min_hits_to_confirm=1),
            batch_size=2)
        frames = rng.integers(0, 255, (6, 48, 64, 3)).astype(np.uint8)
        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person", frame_idx=3)
        outs = list(pred.propagate_in_video(
            sid, "person", start_frame_idx=3,
            propagation_direction="both"))
        assert [o["frame_index"] for o in outs] == [3, 4, 5, 3, 2, 1, 0]
        # max_frame_num_to_track bounds each direction
        outs = list(pred.propagate_in_video(
            sid, "person", start_frame_idx=3, max_frame_num_to_track=2,
            propagation_direction="both"))
        assert [o["frame_index"] for o in outs] == [3, 4, 3, 2]
        # backward-only
        outs = list(pred.propagate_in_video(
            sid, "person", start_frame_idx=2,
            propagation_direction="backward"))
        assert [o["frame_index"] for o in outs] == [2, 1, 0]
        with pytest.raises(ValueError):
            list(pred.propagate_in_video(sid, "person",
                                         propagation_direction="sideways"))

    def test_request_protocol_xywh_boxes(self):
        """bounding_boxes ride the protocol in xywh
        (sam3_video_predictor.py boxes_xywh) and convert to the xyxy
        geometry slots."""
        from skix.tracking.sam3_detector import Sam3Detector

        det = Sam3Detector.tiny()
        prompt = jnp.zeros((1, 4, det.d_model))
        Np, Nb = det.max_points, det.max_boxes
        v = jax.jit(det.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)), prompt,
            points=jnp.zeros((1, Np, 2)),
            point_labels=jnp.zeros((1, Np), jnp.int32),
            point_valid=jnp.zeros((1, Np), bool),
            boxes=jnp.zeros((1, Nb, 4)),
            box_labels=jnp.zeros((1, Nb), jnp.int32),
            box_valid=jnp.zeros((1, Nb), bool))
        pred = VideoPredictor(det, v, smoke_prompts=True)
        frames = rng.integers(0, 255, (2, 40, 56, 3)).astype(np.uint8)
        sid = pred.handle_request({"type": "start_session",
                                   "frames": frames})["session_id"]
        # protocol boxes are NORMALIZED 0-1 xywh (the reference asserts
        # the range, sam3_video_inference.py:882-888) — frame is 56×40,
        # so this is pixel xywh (10, 8, 20, 16)
        pred.handle_request({"type": "add_prompt", "session_id": sid,
                             "text": "person", "frame_index": 0,
                             "bounding_boxes": [[10 / 56, 8 / 40,
                                                 20 / 56, 16 / 40]],
                             "bounding_box_labels": [1]})
        g = pred.sessions[sid].geometry[0]
        # normalized xywh → pixel xyxy (10, 8, 30, 24) → stored as
        # frame-normalized cxcywh: cx=20/56, cy=16/40, w=20/56, h=16/40
        np.testing.assert_allclose(np.asarray(g["boxes"][0]),
                                   [20 / 56, 16 / 40, 20 / 56, 16 / 40],
                                   rtol=1e-5)
        assert bool(g["box_valid"][0])

    def test_remove_object(self):
        det = DetrDetector(img_size=32, patch_size=16, embed_dim=32, depth=1,
                           num_heads=2, num_queries=4, decoder_depth=1,
                           prompt_dim=16)
        pred = VideoPredictor(det, tracker_cfg=TrackerConfig(
            max_objects=4, det_score_threshold=0.0, min_hits_to_confirm=1),
            batch_size=2)
        frames = rng.integers(0, 255, (3, 32, 32, 3)).astype(np.uint8)
        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        first = next(pred.propagate_in_video(sid))
        active_ids = first["outputs"]["obj_id"][first["outputs"]["active"]]
        if len(active_ids):
            pred.remove_object(sid, int(active_ids[0]))
            outs = list(pred.propagate_in_video(sid))
            for o in outs:
                ids = o["outputs"]["obj_id"][o["outputs"]["active"]]
                assert int(active_ids[0]) not in ids.tolist()


class TestTextEncoder:
    def _enc(self):
        from skix.tracking.text_encoder import TextEncoder, tokenize_batch

        model = TextEncoder(dim=32, depth=1, num_heads=2, out_dim=16)
        toks = jnp.asarray(tokenize_batch(["person"], 32))
        variables = model.init(jax.random.PRNGKey(0), toks)
        return model, variables

    def test_tokenize(self):
        from skix.tracking.text_encoder import tokenize, _BOS, _EOS

        t = tokenize("ab", 8)
        assert t[0] == _BOS and t[1] == ord("a") and t[2] == ord("b")
        assert t[3] == _EOS and t[-1] == _EOS and len(t) == 8

    def test_embeddings_unit_norm_and_distinct(self):
        from skix.tracking.text_encoder import encode_texts

        model, variables = self._enc()
        emb = np.asarray(encode_texts(model, variables,
                                      ["person", "snow", "person"]))
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0,
                                   atol=1e-5)
        np.testing.assert_allclose(emb[0], emb[2], atol=1e-6)  # determinism
        assert not np.allclose(emb[0], emb[1])

    def test_session_with_text_encoder(self):
        from skix.tracking.text_encoder import TextEncoder, tokenize_batch

        enc = TextEncoder(dim=32, depth=1, num_heads=2, out_dim=16)
        toks = jnp.asarray(tokenize_batch(["x"], 32))
        enc_vars = enc.init(jax.random.PRNGKey(0), toks)
        det = DetrDetector(img_size=32, patch_size=16, embed_dim=32, depth=1,
                           num_heads=2, num_queries=4, decoder_depth=1,
                           prompt_dim=16)
        pred = VideoPredictor(det, tracker_cfg=TrackerConfig(
            max_objects=4, det_score_threshold=0.0, min_hits_to_confirm=1),
            batch_size=2, text_encoder=(enc, enc_vars))
        frames = rng.integers(0, 255, (3, 32, 32, 3)).astype(np.uint8)
        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        outs = list(pred.propagate_in_video(sid))
        assert len(outs) == 3
