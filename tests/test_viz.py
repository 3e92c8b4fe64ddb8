"""HTML trajectory viewer: mesh-fidelity rendering + env render API.

The reference renders rollouts with brax ``html.render`` (reference:
dial_mpc/core/dial_core.py:289-329) which draws the actual robot meshes;
these tests pin that our self-contained viewer embeds real (decimated)
mesh geometry for mesh-visual models instead of bounding boxes, and that
the env-level ``render_html`` shim (reference env API surface:
unitree_go2_env.py:288-296) produces it.
"""

import json
import os
import re

import mujoco
import numpy as np

from dial_mpc_tpu.utils.io_utils import get_model_path
from dial_mpc_tpu.viz.html_viewer import _decimate, _geoms, _mesh_library, render_trajectory


def _go2_model():
    return mujoco.MjModel.from_xml_path(
        str(get_model_path("unitree_go2", "mjx_scene_force.xml"))
    )


def _extract_payload(path):
    html = open(path).read()
    m = re.search(r"const DATA = (\{.*?\});\nconst cv", html, re.S)
    assert m, "payload not found in viewer HTML"
    return json.loads(m.group(1))


def test_viewer_embeds_real_meshes(tmp_path):
    mj = _go2_model()
    traj = np.tile(mj.key_qpos[0], (5, 1))
    out = render_trajectory(mj, traj, str(tmp_path / "v.html"))
    data = _extract_payload(out)

    mesh_geoms = [g for g in data["geoms"] if g["type"] == "mesh"]
    assert len(mesh_geoms) >= 30  # Go2 visual model is mesh-based
    for g in mesh_geoms:
        flat = data["meshlib"][str(g["mid"])]
        assert len(flat) % 18 == 0 and len(flat) >= 18 * 50  # real triangles
    assert len(data["frames"]) == 5
    assert all(len(f) == len(data["geoms"]) for f in data["frames"])


def test_decimation_preserves_shape_and_bounds():
    mj = _go2_model()
    mid = 0
    va, vn = int(mj.mesh_vertadr[mid]), int(mj.mesh_vertnum[mid])
    fa, fn = int(mj.mesh_faceadr[mid]), int(mj.mesh_facenum[mid])
    verts = mj.mesh_vert[va : va + vn].astype(np.float64)
    faces = mj.mesh_face[fa : fa + fn].astype(np.int64)
    dv, df = _decimate(verts, faces, 1500)
    assert len(df) <= 1500
    assert len(df) > 200  # did not collapse to nothing
    # clustered vertices stay inside the original bounding box
    assert (dv.min(0) >= verts.min(0) - 1e-9).all()
    assert (dv.max(0) <= verts.max(0) + 1e-9).all()
    # no degenerate faces
    assert ((df[:, 0] != df[:, 1]) & (df[:, 1] != df[:, 2]) & (df[:, 0] != df[:, 2])).all()


def test_env_render_html(tmp_path):
    import dial_mpc_tpu.envs as dial_envs

    env = dial_envs.get_environment(
        "unitree_go2_walk", dial_envs.get_config("unitree_go2_walk")()
    )
    # raw qpos rows are accepted alongside State/Data pytrees
    traj = [env.mj_model.key_qpos[0] for _ in range(3)]
    out = env.render_html(traj, str(tmp_path / "env.html"))
    data = _extract_payload(out)
    assert len(data["frames"]) == 3
    assert any(g["type"] == "mesh" for g in data["geoms"])


def test_mesh_library_shared_across_geoms():
    mj = _go2_model()
    geoms = _geoms(mj)
    mids = [g["mid"] for g in geoms if g["type"] == "mesh"]
    # legs reuse the same meshes: library must be keyed by mesh id, not geom
    assert len(set(mids)) < len(mids)
    lib = _mesh_library(mj, set(mids))
    assert set(lib.keys()) == {str(m) for m in set(mids)}
