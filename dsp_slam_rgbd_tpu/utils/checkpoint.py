"""Map-state checkpoint / resume.

The reference has NO SLAM-state checkpointing (SURVEY.md §5: "Resume =
rerun"; only terminal text export).  Here the whole `MapState` pytree
snapshots to one npz and restores exactly — mid-sequence resume, crash
recovery, and A/B experimentation all become possible.
"""
from __future__ import annotations

import numpy as np

from dsp_slam_rgbd_tpu.mapping import map_state as ms


def save_state(path: str, state: ms.MapState, extra: dict | None = None):
    flat = {f: np.asarray(getattr(state, f)) for f in ms.MapState._fields}
    if extra:
        for k, v in extra.items():
            flat[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_state(path: str):
    import jax.numpy as jnp

    z = np.load(path)
    # fields added after a snapshot was written fall back to empty() defaults
    defaults = ms.empty(
        max_kf=int(z["kf_pose"].shape[0]),
        max_feat=int(z["kf_xy"].shape[1]),
        max_pts=int(z["pt_pos"].shape[0]),
        max_obj=int(z["obj_pose"].shape[0]),
        code_len=int(z["obj_code"].shape[1]),
        max_oobs=int(z["oobs_kf"].shape[0]),
    )
    fields = {
        f: jnp.asarray(z[f]) if f in z.files else getattr(defaults, f)
        for f in ms.MapState._fields
    }
    extra = {
        k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
    }
    return ms.MapState(**fields), extra
