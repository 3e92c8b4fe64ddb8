"""Environment + config registries.

The reference split registration between brax's global env registry and a
local config-class dict (reference: dial_mpc/envs/__init__.py:14-30 plus
brax_envs.register_environment calls). We own both registries so user
plug-ins have a single extension point:

    from dial_mpc_tpu.envs import register_env
    register_env("my_env", MyEnv, MyEnvConfig)
"""

from typing import Any, Dict, Tuple, Type

_envs: Dict[str, Any] = {}
_configs: Dict[str, Any] = {}


def register_env(name: str, env_class, config_class=None) -> None:
    _envs[name] = env_class
    if config_class is not None:
        _configs[name] = config_class


def register_config(name: str, config_class) -> None:
    """Reference-compatible alias (envs/__init__.py:17-22)."""
    _configs[name] = config_class


def get_config(name: str):
    if name not in _configs:
        raise ValueError(
            f"unknown env config {name!r}; known: {sorted(_configs)}"
        )
    return _configs[name]


def get_env_class(name: str):
    if name not in _envs:
        raise ValueError(f"unknown env {name!r}; known: {sorted(_envs)}")
    return _envs[name]


def get_environment(name: str, config=None):
    """Instantiate a registered environment (brax_envs.get_environment shape)."""
    cls = get_env_class(name)
    if config is None:
        config = get_config(name)()
    return cls(config)


# import side registers the built-in env families
from dial_mpc_tpu.envs import unitree_go2_env as _go2  # noqa: E402,F401
from dial_mpc_tpu.envs import unitree_h1_env as _h1  # noqa: E402,F401
from dial_mpc_tpu.envs import manipulation as _manip  # noqa: E402,F401

__all__ = [
    "register_env",
    "register_config",
    "get_config",
    "get_env_class",
    "get_environment",
]
