"""Multi-chip data parallelism over a jax.sharding.Mesh.

The reference's only parallelism is process-per-env SubprocVecEnv with
cloudpickle pipes (train.py:44-50, C15 in SURVEY.md).  The TPU-native
equivalent has two nested levels:

  * intra-chip: envs are a vmapped batch dimension in HBM (free)
  * inter-chip: envs are sharded across the 'data' mesh axis with
    shard_map; the PPO gradient reduction is a single psum riding ICI —
    no host transport anywhere in the training path

Policy parameters and optimizer state are replicated; each device runs
rollout + minibatch updates on its local env shard, gradients are
pmean-ed before the optimizer step, so all replicas stay bit-identical.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..learn.ppo import PPO, TrainState


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def train_state_specs(ts: TrainState, axis: str = "data") -> TrainState:
    """PartitionSpecs matching a TrainState: env batch sharded along `axis`,
    everything else replicated."""
    return TrainState(
        params=jax.tree.map(lambda _: P(), ts.params),
        opt_state=jax.tree.map(lambda _: P(), ts.opt_state),
        env_state=jax.tree.map(lambda _: P(axis), ts.env_state),
        obs=P(axis),
        rng=P(),
        rand_power=P(),
        lr_mult=P(),
    )


def shard_train_state(ts: TrainState, mesh: Mesh, axis: str = "data") -> TrainState:
    """Place a TrainState onto the mesh with the DP sharding layout."""
    specs = train_state_specs(ts, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, jax.sharding.NamedSharding(mesh, s)),
        ts, specs,
    )


def multichip_train_iteration(trainer: PPO, mesh: Mesh, ts: TrainState,
                              axis: str = "data"):
    """Build the jitted shard_map train iteration for `mesh`.

    `trainer` must have axis_name == axis so minibatch gradients pmean
    across devices.  `ts` is only used for pytree structure.
    """
    assert trainer.axis_name == axis
    in_specs = train_state_specs(ts, axis)
    metric_specs = P()

    @partial(
        shard_map, mesh=mesh, in_specs=(in_specs,),
        out_specs=(in_specs, metric_specs), check_vma=False,
    )
    def iteration(ts: TrainState):
        rng0 = ts.rng
        idx = jax.lax.axis_index(axis)
        n = jax.lax.axis_size(axis)
        ts = dataclasses.replace(ts, rng=jax.random.fold_in(rng0, idx))
        ts, metrics = trainer._train_iteration_impl(ts)
        # re-synchronize the replicated rng stream deterministically
        ts = dataclasses.replace(ts, rng=jax.random.fold_in(rng0, n + 1))
        metrics = {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
        return ts, metrics

    from ..utils import tpu_jit
    return tpu_jit(iteration)
