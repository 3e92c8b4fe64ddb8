"""Package-resource paths and YAML->dataclass loading.

Same API as the reference's dial_mpc/utils/io_utils.py:5-24 so user configs
and custom-env extensions port over unchanged.
"""

from __future__ import annotations

import os


_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_model_path(robot_name: str, model_name: str) -> str:
    return os.path.join(_PKG_ROOT, "models", robot_name, model_name)


def get_example_path(example_name: str) -> str:
    return os.path.join(_PKG_ROOT, "examples", example_name)


def load_dataclass_from_dict(dataclass, data_dict, convert_list_to_array=False):
    """Intersect dict keys with dataclass fields (flat-YAML union configs)."""
    keys = dataclass.__dataclass_fields__.keys() & data_dict.keys()
    kwargs = {key: data_dict[key] for key in keys}
    if convert_list_to_array:
        import jax.numpy as jnp

        for key, value in kwargs.items():
            if isinstance(value, list):
                kwargs[key] = jnp.array(value)
    return dataclass(**kwargs)
