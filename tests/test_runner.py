"""Sync driver end-to-end on CPU: runs, saves artifacts, reports telemetry."""

import glob
import os

import numpy as np
import yaml

from dial_mpc_tpu.core.runner import run
from dial_mpc_tpu.utils.io_utils import get_example_path


def test_runner_end_to_end(tmp_path):
    with open(get_example_path("unitree_go2_trot.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.update(
        Nsample=8,
        n_steps=3,
        Ndiffuse=1,
        Ndiffuse_init=2,
        output_dir=str(tmp_path),
    )
    out = run(cfg, progress=False)
    assert np.isfinite(out["mean_reward"])
    assert out["latency"]["n"] == 2  # first (compile) step excluded

    states = glob.glob(os.path.join(tmp_path, "*_states.npy"))
    preds = glob.glob(os.path.join(tmp_path, "*_predictions.npy"))
    html = glob.glob(os.path.join(tmp_path, "*_visualization.html"))
    assert states and preds and html
    data = np.load(states[0])
    # rows: [step, qpos(19), qvel(18), ctrl(12)]
    assert data.shape == (3, 1 + 19 + 18 + 12)
    assert os.path.getsize(html[0]) > 10000
