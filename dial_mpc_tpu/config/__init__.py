from dial_mpc_tpu.config.base_env_config import BaseEnvConfig

__all__ = ["BaseEnvConfig"]
