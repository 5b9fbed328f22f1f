r"""Integration tests — suite workflows.

Parity with the reference tier (``tests/test_suite.py:21-66``): create → save
→ load checkpoint roundtrip, full 1-epoch training with vis, 1-trial
hyperopt, full test run, multi-model/multi-dataset brief test with
crop/resize kwargs. All marked slow (like the reference's @pytest.mark.slow).
"""
import numpy as np
import pytest

from vp_suite_tpu import VPSuite

MMF_KWARGS = dict(img_size=16, digit_source="synthetic", n_seqs=16)
RUN_KWARGS = dict(epochs=1, batch_size=4, context_frames=2, pred_frames=2,
                  steps_per_epoch=2, no_wandb=True, vis_every=1,
                  metrics=["mse", "psnr"])


def _fresh_suite(tmp_path):
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", **MMF_KWARGS)
    return suite


@pytest.mark.slow
def test_create_save_load_roundtrip(tmp_path):
    suite = _fresh_suite(tmp_path)
    suite.create_model("convlstm-shi")
    suite.train(out_dir=str(tmp_path / "run"), no_vis=True, **RUN_KWARGS)
    suite2 = VPSuite(device="cpu")
    suite2.load_model(str(tmp_path / "run"), "best_model")
    import jax
    p1 = jax.tree_util.tree_leaves(suite.models[0].state.params)
    p2 = jax.tree_util.tree_leaves(suite2.models[0].state.params)
    assert all(np.allclose(a, b) for a, b in zip(p1, p2))
    assert int(suite2.models[0].state.step) > 0


@pytest.mark.slow
def test_facade_resume_training(tmp_path):
    r"""load_model -> train continues from the saved optimizer state and
    step counter (true mid-training resume; the reference cannot — its
    torch.save drops the optimizer, SURVEY.md §5.4)."""
    suite = _fresh_suite(tmp_path)
    suite.create_model("convlstm-shi")
    suite.train(out_dir=str(tmp_path / "run"), no_vis=True, **RUN_KWARGS)
    step_before = int(suite.models[0].state.step)
    assert step_before > 0

    suite2 = VPSuite(device="cpu")
    suite2.load_dataset("MMF", **MMF_KWARGS)
    suite2.load_model(str(tmp_path / "run"), "final_model")
    assert int(suite2.models[0].state.step) == step_before
    suite2.train(out_dir=str(tmp_path / "run2"), no_vis=True, **RUN_KWARGS)
    assert int(suite2.models[0].state.step) == 2 * step_before


@pytest.mark.slow
def test_training_with_fvd_loss(tmp_path):
    r"""FVD as a TRAINING loss (reference parity: fvd.py:22-24 is explicitly
    loss-capable): one jitted value_and_grad step through resize -> I3D ->
    eigh-Wasserstein must produce finite losses. Needs pred_frames >= 9
    (I3D minimum)."""
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=16, digit_source="synthetic", n_seqs=4)
    suite.create_model("lstm")
    best = suite.train(epochs=1, batch_size=2, context_frames=2, pred_frames=9,
                       steps_per_epoch=1, no_wandb=True, no_vis=True,
                       losses_and_scales={"mse": 1.0, "fvd": 0.01},
                       val_rec_criterion="mse",
                       out_dir=str(tmp_path / "run"), metrics=["mse"])
    assert np.isfinite(best)


@pytest.mark.slow
def test_training_with_vis(tmp_path):
    suite = _fresh_suite(tmp_path)
    suite.create_model("lstm")
    best = suite.train(out_dir=str(tmp_path / "run"), no_vis=False, n_vis=2,
                       **RUN_KWARGS)
    assert np.isfinite(best)
    vis_dirs = list((tmp_path / "run").glob("vis_ep_*"))
    assert len(vis_dirs) >= 1
    assert len(list(vis_dirs[0].glob("*.gif"))) == 2


@pytest.mark.slow
def test_hyperopt_one_trial(tmp_path):
    suite = _fresh_suite(tmp_path)
    suite.create_model("convlstm-shi")
    best_params = suite.hyperopt({"lr": {"min": 1e-5, "max": 1e-3, "scale": "log"}},
                                 n_trials=1, out_dir=str(tmp_path / "run"),
                                 no_vis=True, **RUN_KWARGS)
    assert "lr" in best_params


@pytest.mark.slow
def test_full_test_run(tmp_path):
    suite = _fresh_suite(tmp_path)
    suite.create_model("convlstm-shi")
    suite.load_dataset("MMF", split="test", **MMF_KWARGS)
    results = suite.test(brief_test=True, context_frames=2, pred_frames=2,
                         no_wandb=True, no_vis=True, metrics=["mse", "psnr"])
    assert len(results) == 1
    names = set(results[0].keys())
    assert "CopyLastFrame" in names  # baseline auto-injected
    assert any("EF-ConvLSTM" in n for n in names)
    for mean_metric_dicts in results[0].values():
        assert len(mean_metric_dicts) == 2  # per-horizon metrics for pred 1..2


@pytest.mark.slow
def test_multi_model_brief_test(tmp_path):
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", split="test", img_size=16, digit_source="synthetic",
                       n_seqs=8)
    suite.load_dataset("MMF", **MMF_KWARGS)
    suite.create_model("copy")
    suite.create_model("convlstm-shi")
    results = suite.test(brief_test=True, context_frames=2, pred_frames=2,
                         no_wandb=True, no_vis=True, metrics=["mse"])
    assert len(results) == 1
    assert len(results[0]) >= 2


@pytest.mark.slow
def test_action_conditional_training(tmp_path):
    r"""End-to-end action-conditional training on a SynPick-format fixture
    (actions threaded through unpack -> model -> loss)."""
    import json
    import numpy as np

    # build a miniature SynPick dataset (see test_dataset_fixtures.py)
    import cv2
    rng = np.random.default_rng(0)
    for split in ["train", "val"]:
        rgb = tmp_path / "data" / "processed" / split / "rgb"
        gt = tmp_path / "data" / "processed" / split / "scene_gt"
        rgb.mkdir(parents=True)
        gt.mkdir(parents=True)
        gt_dict = {}
        pos = np.array([0.0, 0.0, 0.0])
        for f in range(90):
            img = (rng.random((34, 60, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(rgb / f"{0:06d}_{f:06d}.png"), img)
            pos = pos + rng.uniform(2, 8, 3)
            gt_dict[str(f)] = [{"cam_t_m2c": pos.tolist()}]
        with open(gt / f"{0:06d}_scene_gt.json", "w") as fp:
            json.dump(gt_dict, fp)

    suite = VPSuite(device="cpu")
    suite.load_dataset("SPM", data_dir=str(tmp_path / "data"), img_size=(32, 32))
    suite.create_model("phy", action_conditional=True)
    best = suite.train(epochs=1, batch_size=2, context_frames=2, pred_frames=2,
                       steps_per_epoch=1, use_actions=True, no_vis=True,
                       no_wandb=True, out_dir=str(tmp_path / "run"))
    assert np.isfinite(best)


@pytest.mark.slow
def test_kth_fixture_end_to_end(tmp_path):
    r"""KTH-format fixture driven through the full train workflow (file-backed
    loader inside the real training loop)."""
    import numpy as np
    import cv2
    from vp_suite_tpu.datasets.kth import KTHActionsDataset, build_kth_metadata

    processed = tmp_path / "data" / "processed"
    seed = 0
    for c in KTHActionsDataset.CLASSES:
        for person in ["person01", "person02", "person22"]:
            vid_dir = processed / c / f"{person}_{c}_d1"
            vid_dir.mkdir(parents=True)
            rng = np.random.default_rng(seed)
            seed += 1
            for f in range(32):
                img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(vid_dir / f"image-{f:03d}_64x64.png"), img)
    build_kth_metadata(processed, KTHActionsDataset.CLASSES)

    suite = VPSuite(device="cpu")
    suite.load_dataset("KTH", data_dir=str(tmp_path / "data"), img_size=(32, 32))
    suite.create_model("unet-3d", temporal_dim=2)
    best = suite.train(epochs=1, batch_size=4, context_frames=2, pred_frames=2,
                       steps_per_epoch=2, no_vis=True, no_wandb=True,
                       out_dir=str(tmp_path / "run"))
    assert np.isfinite(best)


def test_test_logger_sink(tmp_path, monkeypatch):
    r"""The test-run metric sink must write JSONL always and route per-model
    metrics + videos to wandb when importable (reference
    ``vpsuite.py:588-611`` parity)."""
    import json
    import sys
    import types
    from vp_suite_tpu.vpsuite import _TestLogger

    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda d: calls["log"].append(d)
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    fake.Video = lambda fp, fps=4, format=None: ("video", fp)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    (tmp_path / "vis_0_model.gif").write_bytes(b"GIF89a")
    logger = _TestLogger(tmp_path, "brief", no_wandb=False, no_vis=False)
    metrics = [{"mse": 1.0, "psnr": 20.0}, {"mse": 2.0, "psnr": 18.0}]
    logger.log_model("ConvLSTM", "/some/dir", metrics)
    logger.log_model("CopyLastFrame", None, [{"mse": 3.0, "psnr": 15.0}])
    logger.finish()

    lines = [json.loads(x) for x in (tmp_path / "test_metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 3
    assert lines[0] == {"model": "ConvLSTM", "model_dir": "/some/dir",
                        "test_mode": "brief", "pred_frames": 1,
                        "mse": 1.0, "psnr": 20.0}
    assert [kw["name"] for kw in calls["init"]] == \
        ["ConvLSTM (brief test)", "CopyLastFrame (brief test)"]
    assert calls["init"][0]["reinit"] is False and calls["init"][1]["reinit"] is True
    # 2 horizons + 1 video dict for the first model; 1 horizon for the
    # baseline (model_dir None -> no video log, reference parity)
    video_logs = [d for d in calls["log"] if any(isinstance(v, tuple) for v in d.values())]
    assert len(video_logs) == 1
    assert calls["finish"] == 1


def test_test_logger_no_wandb(tmp_path, monkeypatch):
    import sys
    from vp_suite_tpu.vpsuite import _TestLogger
    monkeypatch.setitem(sys.modules, "wandb", None)  # import fails
    logger = _TestLogger(tmp_path, "full", no_wandb=True)
    logger.log_model("M", None, [{"mse": 1.0}])
    logger.finish()
    assert (tmp_path / "test_metrics.jsonl").exists()
