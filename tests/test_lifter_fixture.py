"""End-to-end accuracy evidence with a COMMITTED checkpoint.

The zero-egress environment cannot download the reference's pretrained
lifter, so ``tests/fixtures/lifter_tiny.npz`` (trained offline by
scripts/make_lifter_fixture.py on a synthetic Unity-style pose manifold)
stands in: checkpoint → load_checkpoint → inference → MPJPE against
held-out synthetic GT below the reference's claimed 50 mm fusion
operating point (doc/process_documentation.md:202)."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

FIXTURE = Path(__file__).parent / "fixtures" / "lifter_tiny.npz"
sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))


@pytest.fixture(scope="module")
def lifter():
    from make_lifter_fixture import synth_clip  # noqa: F401 (import check)

    from skix.models.videopose3d import TemporalLifter
    from skix.pipelines.videopose3d import load_checkpoint

    model = TemporalLifter(filter_widths=(3, 3, 3), channels=128)
    variables = load_checkpoint(str(FIXTURE))
    return model, variables


class TestCommittedCheckpoint:
    def test_held_out_mpjpe_below_50mm(self, lifter):
        from make_lifter_fixture import H, W, synth_clip

        from skix.geometry.camera import normalize_screen_coordinates
        from skix.models.videopose3d import infer_sequence

        model, variables = lifter
        errs = []
        for seed in (1000, 1001, 1002):  # never seen in training (0..191)
            x3, px = synth_clip(seed=seed, T=120)
            norm = normalize_screen_coordinates(jnp.asarray(px), W, H)
            pred = infer_sequence(model, variables, norm)
            errs.append(float(jnp.mean(
                jnp.linalg.norm(pred - jnp.asarray(x3), axis=-1))))
        assert float(np.mean(errs)) < 0.050, errs

    def test_cli_runs_with_committed_checkpoint(self, tmp_path, lifter):
        """record → videopose3d CLI with the committed ckpt → valid npy
        (the CLI path converts COCO→H36M, which re-synthesizes torso
        joints — accuracy is asserted at the library level above)."""
        from make_lifter_fixture import H, W, synth_clip

        from skix.geometry.skeletons import h36m_to_coco
        from skix.io import PTInfo, save_pt_info
        from skix.pipelines.videopose3d import main

        T = 40
        pdir = tmp_path / "pt" / "p01"
        pdir.mkdir(parents=True)
        for view, seed in (("osmo_1", 2000), ("osmo_2", 2001)):
            _, px = synth_clip(seed=seed, T=T)
            coco = np.asarray(h36m_to_coco(jnp.asarray(px)))
            score = np.ones((T, 17), np.float32)
            info = PTInfo(video_name=view, frame_count=T, img_shape=(H, W),
                          fps=30.0, duration=T / 30.0,
                          d2_keypoints=np.concatenate(
                              [coco, score[..., None]], -1).astype(
                                  np.float32),
                          d2_keypoints_score=score)
            save_pt_info(pdir / f"{view}.npz", info)
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "videopose3d.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
  out_root: {tmp_path / 'out'}
checkpoint: {FIXTURE}
filter_widths: [3, 3, 3]
channels: 128
""")
        main([f"--config-dir={cdir}"])
        outs = sorted((tmp_path / "out").rglob("*.npy"))
        assert outs, "CLI produced no outputs"
        arr = np.load(outs[0])
        assert arr.shape == (T, 17, 3)
        assert np.isfinite(arr).all()
        # the lifter output is in meters at human scale
        spans = np.linalg.norm(arr.max(1) - arr.min(1), axis=-1)
        assert 0.3 < float(np.median(spans)) < 4.0
