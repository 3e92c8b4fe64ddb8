"""Sample-axis sharded DIAL-MPC planner (mesh + shard_map + collectives).

The reference's only parallelism is a single-device ``jax.vmap`` over the
sample axis (reference: dial_mpc/core/dial_core.py:81). Here the sample
axis is sharded over a 1-D device mesh (ICI within a slice; flatten a
2-D hosts x chips mesh into the same axis for multi-host pods):

- each device rolls out ``Nsample / n_devices`` noised trajectories plus a
  replicated evaluation of the current mean trajectory;
- the MPPI reduction (mean/std normalization, log-sum-exp-stable softmax,
  weighted averages of node plans and telemetry) is computed exactly over
  the global sample set with ``psum``/``pmax`` collectives — no device ever
  materializes the full sample batch;
- per-sample RNG keys are derived by ``fold_in(key, global_sample_index)``,
  so results are bitwise invariant to the mesh shape (1 chip, 1 host, or a
  pod produce identical plans for the same seed).

The math matches MBDPI.reverse_once (softmax over Nsample+1 rewards with
the mean sample appended, dial_core.py:104-135); only the RNG stream layout
differs from the reference's single ``jax.random.normal`` call, which is
inherently layout-dependent.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dial_mpc_tpu.core.dial_core import MBDPI

AXIS = "samples"


def make_sample_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, sample axis sharded."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (AXIS,))


class ShardedMBDPI:
    """Mesh-parallel planner with the same control_step surface as MBDPI."""

    def __init__(self, args, env, mesh: Mesh):
        self.inner = MBDPI(args, env)
        self.args = args
        self.env = env
        self.mesh = mesh
        self.nu = self.inner.nu
        n_dev = mesh.devices.size
        if args.Nsample % n_dev:
            raise ValueError(
                f"Nsample={args.Nsample} must divide the mesh size {n_dev}"
            )
        self.local_samples = args.Nsample // n_dev
        self.sigma_control = self.inner.sigma_control
        # spline node grid, used by the deploy planner's wall-clock shift
        self.step_nodes = self.inner.step_nodes
        self.step_us = self.inner.step_us

        self._reverse_once_sharded = jax.jit(
            jax.shard_map(
                self._reverse_once_local,
                mesh=self.mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=(P(), P(), {"rews": P(AXIS), "xbar": P(), "new_noise_scale": P()}),
                check_vma=False,
            )
        )

    # -- per-shard computation ---------------------------------------------

    def _reverse_once_local(self, state, rng, Ybar_i, noise_scale):
        """Executed once per device under shard_map; replicated inputs."""
        args = self.args
        shard = jax.lax.axis_index(AXIS)

        # mesh-invariant per-sample noise: fold the global sample id into the
        # level key, then one normal draw per sample
        level_key = jax.random.fold_in(rng, 0)
        global_idx = shard * self.local_samples + jnp.arange(self.local_samples)
        sample_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            level_key, global_idx
        )
        eps = jax.vmap(
            lambda k: jax.random.normal(k, (args.Hnode + 1, self.nu))
        )(sample_keys)

        Y0s = eps * noise_scale[None, :, None] + Ybar_i
        Y0s = Y0s.at[:, 0].set(Ybar_i[0])  # first node pinned
        Y0s = jnp.clip(Y0s, -1.0, 1.0)
        Ybar_clip = jnp.clip(Ybar_i, -1.0, 1.0)

        # roll the (replicated) mean trajectory as the last row of the local
        # batch — a separate unbatched rollout would run the scalar physics
        # path, which serializes thousands of tiny ops
        Y0s_aug = jnp.concatenate([Y0s, Ybar_clip[None]], axis=0)
        us = self.inner.node2u(Y0s_aug)
        rewss, statess_aug = jax.vmap(
            lambda u: self.inner.rollout_us(state, u)
        )(us)

        rews_all = rewss.mean(axis=-1)  # (local+1,)
        rews = rews_all[:-1]
        rew_Ybar = rews_all[-1]

        # global mean/std over the finite samples (+ mean sample once);
        # non-finite rollouts are excluded and get zero softmax weight
        finite = jnp.isfinite(rews)
        rews_f = jnp.where(finite, rews, 0.0)
        n_tot = jax.lax.psum(finite.sum().astype(rews.dtype), AXIS) + 1.0
        s1 = jax.lax.psum(rews_f.sum(), AXIS) + rew_Ybar
        s2 = jax.lax.psum((rews_f**2).sum(), AXIS) + rew_Ybar**2
        mean = s1 / n_tot
        var = jnp.maximum(s2 / n_tot - mean**2, 0.0)
        std = jnp.sqrt(var)

        # softmax is shift-invariant: center on the mean-rollout reward when
        # it is finite, 0 otherwise (a non-finite mean must not poison the
        # finite samples' weights — it just gets -inf itself)
        bar_finite = jnp.isfinite(rew_Ybar)
        center = jnp.where(bar_finite, rew_Ybar, 0.0)
        std = jnp.where(jnp.isfinite(std) & (std > 0), std, 1.0)
        logp = jnp.where(
            finite, (rews - center) / std / args.temp_sample, -jnp.inf
        )
        logp_bar = jnp.where(bar_finite, 0.0, -jnp.inf)

        # log-sum-exp-stable softmax over the global set
        gmax = jnp.maximum(jax.lax.pmax(logp.max(), AXIS), logp_bar)
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        e = jnp.exp(logp - gmax)
        e_bar = jnp.exp(logp_bar - gmax)
        denom = jax.lax.psum(e.sum(), AXIS) + e_bar
        # degradation: if EVERY rollout (mean included) exploded, keep the
        # current plan (all weight on the replicated mean row)
        all_bad = denom == 0.0
        w = jnp.where(all_bad, 0.0, e / jnp.maximum(denom, 1e-30))
        w_bar = jnp.where(all_bad, 1.0, e_bar / jnp.maximum(denom, 1e-30))

        # weighted means via psum. The (replicated) mean-sample row is the
        # LAST row of the augmented batch on every device; giving it weight
        # w_bar / n_dev makes the psum add it exactly once — no slicing
        # copies of the rollout arrays (each is (local+1, Hsample+1, ...)).
        # Zero-weight (non-finite) samples are zeroed so 0 * nan never leaks.
        n_dev = jax.lax.psum(1, AXIS)
        w_aug = jnp.concatenate(
            [jnp.where(finite, w, 0.0), (w_bar / n_dev)[None]], axis=0
        )
        finite_aug = jnp.concatenate(
            [finite, jnp.ones(1, bool)], axis=0
        )

        def wavg(samples_aug):
            mask = finite_aug.reshape((-1,) + (1,) * (samples_aug.ndim - 1))
            local = jnp.einsum(
                "n,n...->...", w_aug, jnp.where(mask, samples_aug, 0.0)
            )
            return jax.lax.psum(local, AXIS)

        Ybar_new = wavg(Y0s_aug)
        # qbar/qdbar deliberately not reduced — see core/dial_core.py:
        # nothing downstream consumes them, and dropping them DCEs the
        # stacked qpos/qvel rollout outputs on every shard
        xbar = wavg(statess_aug.x_pos)

        rng = jax.random.fold_in(rng, 1)  # advance the level stream
        info = {
            "rews": rews,  # sharded (Nsample,) — mean-sample reward excluded
            "xbar": xbar,
            "new_noise_scale": noise_scale,
        }
        return rng, Ybar_new, info

    # -- public surface ------------------------------------------------------

    def reverse_once(self, state, rng, Ybar_i, noise_scale):
        return self._reverse_once_sharded(state, rng, Ybar_i, noise_scale)

    def shift(self, Y):
        return self.inner.shift(Y)

    def node2u(self, Y):
        return self.inner.node2u(Y)

    def u2node(self, u):
        return self.inner.u2node(u)

    def diffuse_factors(self, n_diffuse):
        return self.inner.diffuse_factors(n_diffuse)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def control_step(self, state, Y, rng, n_diffuse: int):
        """One receding-horizon step, sample axis sharded over the mesh."""
        # same divergence freeze as MBDPI.control_step
        new_state = self.env.step(state, Y[0])
        ok = jnp.isfinite(new_state.pipeline_state.qpos).all() & jnp.isfinite(
            new_state.pipeline_state.qvel
        ).all()
        state = new_state.replace(
            pipeline_state=jax.tree.map(
                lambda n, o: jnp.where(ok, n, o),
                new_state.pipeline_state,
                state.pipeline_state,
            ),
            reward=jnp.where(ok, new_state.reward, state.reward),
        )
        Y = self.inner.shift(Y)

        def reverse_scan(carry, factor):
            rng, Y, st = carry
            rng, Y, info = self._reverse_once_sharded(st, rng, Y, factor)
            return (rng, Y, st), info

        (rng, Y, _), info = jax.lax.scan(
            reverse_scan, (rng, Y, state), self.diffuse_factors(n_diffuse)
        )
        return state, Y, rng, info
