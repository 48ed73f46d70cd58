"""On-device PPO: rollout, GAE, clipped updates — all fused under jit.

Replaces the reference's SB3 PPO + SubprocVecEnv stack (train.py:44-136 /
C14-C15 in SURVEY.md).  Where the reference ships 48 floats per env per
step over multiprocessing pipes and runs torch updates on a single
process, here simulation, policy inference, advantage estimation and the
optimizer all live in HBM: one `lax.scan` collects the rollout (sim+policy
fused), and the update epochs are a nested scan over shuffled minibatches.

Hyperparameter defaults mirror the reference's SB3 settings (SURVEY.md §6:
lr 3e-4, n_steps 2048, minibatch 64, 10 epochs, gamma 0.99, lambda 0.95,
clip 0.2, vf_coef 0.5, max_grad_norm 0.5, Adam eps 1e-5), rescaled for
thousands of on-device envs via config.

Truncation bootstrapping follows SB3/gymnasium semantics: truncated
episodes bootstrap from the value of the terminal observation, terminated
ones do not.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..env.go1 import Go1Env
from ..utils import tpu_jit
from ..models.actor_critic import Policy


@dataclasses.dataclass(eq=False)
class PPOConfig:
    num_envs: int = 4096
    n_steps: int = 32               # rollout length per env per iteration
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    n_epochs: int = 10
    num_minibatches: int = 32
    normalize_advantage: bool = True
    adam_eps: float = 1e-5
    # adaptive-KL learning rate (legged_gym-style, None = fixed lr).
    # Round-5 finding: at 262k-sample batches the fixed SB3 lr keeps
    # approx_kl ~0.002-0.003 regardless of 3e-4 vs 1e-3 — 4x under the
    # ~0.01 this recipe family holds — and the policy MEAN lags what
    # exploration finds (results/walk_r4_progress/MEANLAG_75M.md: the
    # stochastic policy walks 3.5x further than its mean).  When set,
    # the per-minibatch KL drives a multiplicative lr adjustment
    # (x1.5 when kl < target/2, /1.5 when kl > 2*target), bounded to
    # [lr_min, lr_max] effective.  The multiplier lives in
    # TrainState.lr_mult; it is NOT checkpointed and re-adapts within a
    # few iterations of a resume.
    kl_target: float | None = None
    lr_min: float = 1e-5
    lr_max: float = 1e-2
    # rollout chunking: number of control steps fused into ONE jitted
    # program.  None = the whole rollout + update is a single program (best
    # when the runtime allows it; CPU tests, healthy TPU runtimes).  The
    # axon TPU runtime kills any single program executing longer than a few
    # seconds, so large-batch training sets a chunk that keeps each
    # program's wall-clock short; dispatch is async, chunks pipeline.
    rollout_chunk: int | None = None

    @property
    def batch_size(self) -> int:
        return self.num_envs * self.n_steps

    @property
    def minibatch_size(self) -> int:
        return self.batch_size // self.num_minibatches


@flax.struct.dataclass
class TrainState:
    """On-device training state.

    The total-env-step counter deliberately lives OUTSIDE this pytree (a
    Python int on the Runner): an in-jit i32 counter overflows at 2.1B
    steps — ~35 minutes at the 1M steps/s target — and x64 is off on TPU.
    """

    params: Any                    # policy variables
    opt_state: Any
    env_state: Any                 # batched EnvState
    obs: jax.Array                 # (B, obs_dim) current observations
    rng: jax.Array
    rand_power: jax.Array          # curriculum value pushed into resets
    # adaptive-KL lr multiplier (PPOConfig.kl_target); 1.0 when disabled.
    # Deliberately absent from checkpoints (old train_states restore
    # cleanly); re-adapts from 1.0 within ~4 iterations of a resume.
    lr_mult: jax.Array


@flax.struct.dataclass
class Transition:
    obs: jax.Array
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    terminated: jax.Array
    done: jax.Array
    bootstrap_value: jax.Array     # V(terminal or next obs) used in GAE
    info: Any


class PPO:
    """Static trainer object (hashable by identity for jit)."""

    def __init__(
        self, env: Go1Env, cfg: PPOConfig, policy: Policy | None = None,
        axis_name: str | None = None,
    ):
        self.env = env
        self.cfg = cfg
        self.policy = policy or Policy.make(act_dim=env.nu)
        self.axis_name = axis_name  # set for multi-chip shard_map DP
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.learning_rate, eps=cfg.adam_eps),
        )

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # ------------------------------------------------------------------ init

    def init(self, rng: jax.Array, rand_power: float = 0.0) -> TrainState:
        k_pol, k_env, k_train = jax.random.split(rng, 3)
        variables = self.policy.init(
            k_pol, obs_dim=getattr(self.env, "obs_dim", 48)
        )
        opt_state = self.tx.init(variables)
        keys = jax.random.split(k_env, self.cfg.num_envs)
        env_state = jax.vmap(lambda k: self.env.reset(k, rand_power=rand_power))(keys)
        obs = jax.vmap(self.env.obs)(env_state)
        return TrainState(
            params=variables,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs.astype(jnp.float32),
            rng=k_train,
            rand_power=jnp.asarray(rand_power, jnp.float32),
            lr_mult=jnp.asarray(1.0, jnp.float32),
        )

    # --------------------------------------------------------------- rollout

    def _rollout_step(self, carry, _):
        ts = carry
        rng, k_act = jax.random.split(ts.rng)
        action, log_prob, value, _ = self.policy.sample(ts.params, ts.obs, k_act)
        env_state, obs, reward, terminated, truncated, info = jax.vmap(
            self.env.step_autoreset
        )(ts.env_state, action)
        done = terminated | truncated
        # SB3-style truncation bootstrap: V(terminal_obs) for truncated,
        # masked for terminated; info carries the pre-reset observation
        term_obs = info.pop("terminal_observation")
        _, _, term_value = self.policy.apply(ts.params, term_obs)
        bootstrap = jnp.where(terminated, 0.0, term_value)
        tr = Transition(
            obs=ts.obs,
            action=action,
            log_prob=log_prob,
            value=value,
            reward=reward.astype(jnp.float32),
            terminated=terminated,
            done=done,
            bootstrap_value=bootstrap.astype(jnp.float32),
            # the rest of info (~25 per-step reward/diagnostic channels) is
            # never consumed by the update — stacking it across the scan
            # would make every rollout program materialize and return
            # n_steps x num_envs x 25 floats of dead weight (the eval path
            # surfaces the channel decomposition instead)
            info=None,
        )
        ts = dataclasses.replace(
            ts, env_state=env_state, obs=obs.astype(jnp.float32), rng=rng,
        )
        return ts, tr

    def _push_rand_power(self, ts: TrainState) -> TrainState:
        # curriculum plumbing: broadcast the annealed TrainState.rand_power
        # into every env's reset-noise scale so autoresets inside the scan
        # use the CURRENT schedule value (reference CurriculumCallback
        # pushes it via VecEnv set_attr every step, training_callback.py:64)
        ev = ts.env_state
        return dataclasses.replace(
            ts,
            env_state=dataclasses.replace(
                ev,
                rand_power=jnp.broadcast_to(
                    jnp.asarray(ts.rand_power, ev.rand_power.dtype),
                    ev.rand_power.shape,
                ),
            ),
        )

    def rollout(self, ts: TrainState, length: int | None = None):
        ts = self._push_rand_power(ts)
        ts, traj = jax.lax.scan(
            self._rollout_step, ts, None,
            length=self.cfg.n_steps if length is None else length,
        )
        return ts, traj

    # ------------------------------------------------------------------- GAE

    def gae(self, traj: Transition, last_value: jax.Array):
        cfg = self.cfg

        def body(carry, tr):
            gae_next, value_next = carry
            # on done steps the next state belongs to a new episode: use the
            # stored bootstrap value (0 if terminated, V(terminal) truncated)
            v_next = jnp.where(tr.done, tr.bootstrap_value, value_next)
            nonterm = 1.0 - tr.done.astype(jnp.float32)
            delta = tr.reward + cfg.gamma * v_next - tr.value
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterm * gae_next
            return (gae, tr.value), gae

        zeros = jnp.zeros_like(last_value)
        _, advantages = jax.lax.scan(
            body, (zeros, last_value), traj, reverse=True
        )
        returns = advantages + traj.value
        return advantages, returns

    # ---------------------------------------------------------------- update

    def _loss(self, params, batch):
        cfg = self.cfg
        obs, action, old_logp, old_value, adv, ret = batch
        mean, log_std, value = self.policy.apply(params, obs)
        logp = Policy.log_prob(mean, log_std, action)
        ratio = jnp.exp(logp - old_logp)
        if cfg.normalize_advantage:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range)
        pg_loss = jnp.maximum(pg1, pg2).mean()
        v_loss = 0.5 * jnp.square(ret - value).mean()
        ent = Policy.entropy(log_std).mean()
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
        clipfrac = (jnp.abs(ratio - 1.0) > cfg.clip_range).mean()
        approx_kl = ((ratio - 1.0) - jnp.log(ratio)).mean()
        return loss, dict(
            loss=loss, pg_loss=pg_loss, v_loss=v_loss, entropy=ent,
            clip_fraction=clipfrac, approx_kl=approx_kl,
        )

    def update(self, ts: TrainState, traj: Transition):
        cfg = self.cfg
        _, _, last_value = self.policy.apply(ts.params, ts.obs)
        advantages, returns = self.gae(traj, last_value)

        # batch size from actual shapes: under shard_map this is the LOCAL
        # shard, not cfg.num_envs * n_steps
        T, B = traj.reward.shape
        batch = T * B
        mb_size = batch // cfg.num_minibatches

        flat = jax.tree.map(
            lambda x: x.reshape((batch,) + x.shape[2:]),
            (traj.obs, traj.action, traj.log_prob, traj.value, advantages,
             returns),
        )

        def epoch(carry, _):
            params, opt_state, rng, lr_mult = carry
            rng, k = jax.random.split(rng)
            perm = jax.random.permutation(k, batch)
            shuffled = jax.tree.map(lambda x: x[perm], flat)
            mb = jax.tree.map(
                lambda x: x.reshape(
                    (cfg.num_minibatches, mb_size) + x.shape[1:]
                ),
                shuffled,
            )

            def minibatch(carry, batch_):
                params, opt_state, lr_mult = carry
                grads, metrics = jax.grad(self._loss, has_aux=True)(
                    params, batch_
                )
                if self.axis_name is not None:
                    grads = jax.lax.pmean(grads, self.axis_name)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                if cfg.kl_target is not None:
                    # scale THIS step by the multiplier adapted so far,
                    # then adapt from this minibatch's KL (legged_gym
                    # order: observe, step, adjust for the next)
                    updates = jax.tree.map(lambda u: u * lr_mult, updates)
                    kl = metrics["approx_kl"]
                    if self.axis_name is not None:
                        # shards see different minibatches; adapt from the
                        # global KL so lr_mult stays bit-identical across
                        # the mesh (params already are, via pmean'd grads)
                        kl = jax.lax.pmean(kl, self.axis_name)
                    t = cfg.kl_target
                    lr_mult = jnp.where(
                        kl > 2.0 * t, lr_mult / 1.5,
                        jnp.where(kl < 0.5 * t, lr_mult * 1.5, lr_mult),
                    )
                    lr_mult = jnp.clip(
                        lr_mult,
                        cfg.lr_min / cfg.learning_rate,
                        cfg.lr_max / cfg.learning_rate,
                    )
                    metrics = dict(
                        metrics, lr_effective=lr_mult * cfg.learning_rate
                    )
                params = optax.apply_updates(params, updates)
                return (params, opt_state, lr_mult), metrics

            (params, opt_state, lr_mult), metrics = jax.lax.scan(
                minibatch, (params, opt_state, lr_mult), mb
            )
            return (params, opt_state, rng, lr_mult), metrics

        (params, opt_state, rng, lr_mult), metrics = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, ts.rng, ts.lr_mult), None,
            length=cfg.n_epochs,
        )
        ts = dataclasses.replace(
            ts, params=params, opt_state=opt_state, rng=rng, lr_mult=lr_mult
        )
        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        return ts, metrics

    # ------------------------------------------------------------- iteration

    def _train_iteration_impl(self, ts: TrainState):
        """rollout + update; returns (ts, metrics dict).  Not jitted —
        wrapped by train_iteration (single chip) or the shard_map builder
        in parallel.mesh (multi-chip)."""
        ts, traj = self.rollout(ts)
        ts, metrics = self.update(ts, traj)
        metrics = dict(
            metrics,
            mean_reward=traj.reward.mean(),
            mean_episode_nonterm=1.0 - traj.done.mean(),
            # dead-signal telemetry (VERDICT r2 #2): identically-zero
            # rewards across a whole rollout mean zero advantages and a
            # no-op update — the Runner aborts loudly after K such
            # iterations instead of burning TPU-hours
            reward_nonzero_frac=(traj.reward != 0.0).mean(),
        )
        return ts, metrics

    @partial(tpu_jit, static_argnums=0)
    def train_iteration(self, ts: TrainState):
        return self._train_iteration_impl(ts)

    # ------------------------------------------------- chunked iteration

    @partial(tpu_jit, static_argnums=(0, 2))
    def _rollout_chunk(self, ts: TrainState, length: int):
        return self.rollout(ts, length=length)

    @partial(tpu_jit, static_argnums=0)
    def _update_with_metrics(self, ts: TrainState, traj: Transition):
        ts, metrics = self.update(ts, traj)
        metrics = dict(
            metrics,
            mean_reward=traj.reward.mean(),
            mean_episode_nonterm=1.0 - traj.done.mean(),
            reward_nonzero_frac=(traj.reward != 0.0).mean(),
        )
        return ts, metrics

    def rollout_chunked(self, ts: TrainState):
        """The chunk-dispatched rollout of train_iteration_chunked alone
        (phase-timing instrumentation hook)."""
        cfg = self.cfg
        chunk = cfg.rollout_chunk or cfg.n_steps
        chunks = []
        done = 0
        while done < cfg.n_steps:
            n = min(chunk, cfg.n_steps - done)
            ts, traj = self._rollout_chunk(ts, n)
            chunks.append(traj)
            done += n
        if len(chunks) == 1:
            return ts, chunks[0]
        return ts, jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks
        )

    def train_iteration_chunked(self, ts: TrainState):
        """Same result as train_iteration, but the rollout is split into
        cfg.rollout_chunk-step jitted programs dispatched from the host
        (async — chunks pipeline), and the PPO update is its own program.
        This keeps every single XLA program's execution time bounded, which
        the current TPU runtime requires at large env batches."""
        ts, traj = self.rollout_chunked(ts)
        return self._update_with_metrics(ts, traj)
