from dial_mpc_tpu.parallel.sharded import ShardedMBDPI, make_sample_mesh

__all__ = ["ShardedMBDPI", "make_sample_mesh"]
