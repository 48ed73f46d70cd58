"""Throughput benchmark: env control-steps/sec at 4096 vmapped Go1 envs.

Counts control steps (policy inference + 10 physics substeps + obs/reward,
the same unit the reference's quick_benchmark measures over SubprocVecEnv,
test_max_envs.py:107-169).  The reference publishes no numbers; BASELINE.md
sets the north-star at 1e6 env-steps/sec/chip, so vs_baseline = value/1e6.

Runtime constraints honored (see .claude/skills/verify/SKILL.md):
  * the axon TPU runtime kills any single XLA program that executes longer
    than a few seconds, so the rollout is dispatched as short jitted chunks
    from the host (async dispatch — chunks pipeline, the host loop adds no
    bubble at these program sizes)
  * block_until_ready is unreliable on axon; timing syncs use device_get

Prints exactly one JSON line.
"""

import json
import os
import sys
import threading
import time

# Watchdog: a wedged axon tunnel blocks inside device init/dispatch with
# no Python-level timeout, which would hang an unattended bench run
# forever; exit with a distinct code instead so callers see a clean
# failure.  Generous default: a cold TPU compile of the fused step is
# minutes.
_DEADLINE_S = float(os.environ.get("QTPU_BENCH_DEADLINE", "1500"))


def _watchdog():
    time.sleep(_DEADLINE_S)
    print(
        json.dumps({"error": f"bench watchdog: no result in {_DEADLINE_S}s "
                             "(TPU tunnel wedged?)"}),
        file=sys.stderr, flush=True,
    )
    os._exit(3)


# TPU arbitration (VERDICT r2 #3): the round-2 driver bench wedged with
# no number because a training run held the chip.  Post a preemption
# request and wait (bounded) for the supervisor to checkpoint-and-yield;
# training resumes automatically when this process exits.  The wait runs
# BEFORE the watchdog starts so a slow yield doesn't eat the compile
# budget.
from quadruped_tpu.utils import tpulock  # noqa: E402  (pre-jax: cheap, no device touch)

if os.environ.get("QTPU_FORCE_CPU"):
    pass  # CPU validation run: do not preempt a TPU training segment
elif not tpulock.acquire_with_preempt(
    "bench", timeout_s=float(os.environ.get("QTPU_LOCK_TIMEOUT", "420"))
):
    print(
        json.dumps({"warning": "TPU lock contested past timeout; "
                               "benching anyway", "holder": tpulock.holder()}),
        file=sys.stderr, flush=True,
    )

threading.Thread(target=_watchdog, daemon=True).start()

import jax

if os.environ.get("QTPU_FORCE_CPU"):
    # JAX_PLATFORMS in the environment is not honored once the axon PJRT
    # plugin is discoverable — pin through jax.config before backend init
    # (same guard as cli/train.py main; used for harness validation runs
    # that must not preempt a TPU training segment)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from quadruped_tpu.utils import cache as _cache
from quadruped_tpu.utils import tpu_jit
_cache.enable()

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.models.actor_critic import Policy

NUM_ENVS = int(os.environ.get("QTPU_BENCH_ENVS", 4096))
WARMUP = 3
# metric-of-record hardening (VERDICT r4 weak #6): 3 windows x 40 steps
# (~7.5 s total at the r4 rate) instead of a single thin 20-step window;
# the reported value is the MEDIAN window, with per-window values and
# spread in the JSON so regressions are attributable vs noise.
TIMED_STEPS = int(os.environ.get("QTPU_BENCH_STEPS", 40))
WINDOWS = int(os.environ.get("QTPU_BENCH_WINDOWS", 3))
BASELINE = 1.0e6


def build():
    # 8 warmstarted Newton iterations is the TRAINING profile: max qpos
    # drift vs the MuJoCo oracle over 300 substeps is 1.8e-4 (15 iters:
    # 7e-10; A/B table in PLAN.md).  MuJoCo itself runs 2-5 warm
    # iterations to tolerance on this model; oracle-parity tests pin the
    # near-exact 15-iteration profile explicitly.
    it = os.environ.get("QTPU_SOLVER_ITERS", "8")
    # Condim row pools: default ON — measured +26% on-chip (v5e A/B
    # matrix in PLAN.md: 4,948 -> 6,233 steps/s at 8 iterations; pooled
    # trajectory drift vs the oracle is layout-neutral, tools/drift_ab.py).
    # QTPU_POOLS overrides ("" disables, "K6,K3,K1" sets the budgets).
    pools = os.environ.get("QTPU_POOLS", "8,28,12")
    env = Go1Env(Go1Config(
        ctrl_type="torque",
        solver_iterations=int(it) if it else None,
        contact_pools=(
            tuple(int(x) for x in pools.split(",")) if pools else None
        ),
    ))
    policy = Policy.make(act_dim=env.nu)
    variables = policy.init(jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda x: x.astype(jnp.float32), variables)

    keys = jax.random.split(jax.random.PRNGKey(1), NUM_ENVS)
    state = tpu_jit(jax.vmap(env.reset))(keys)
    state = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        state,
    )
    obs = tpu_jit(jax.vmap(env.obs))(state).astype(jnp.float32)

    @tpu_jit
    def step(variables, state, obs, rng):
        """ONE control step per program: policy sample + 10 physics
        substeps + obs/reward + autoreset.  Bounded execution time."""
        rng, k = jax.random.split(rng)
        action, _, _, _ = policy.sample(variables, obs, k)
        state, obs, reward, term, trunc, _ = jax.vmap(env.step_autoreset)(
            state, action
        )
        return state, obs.astype(jnp.float32), rng, reward.mean()

    return variables, state, obs, step


def _phase_breakdown(env, iters=5):
    """Per-substep stage timings (ms) at the bench batch size, so a perf
    regression in the headline number is attributable to a stage
    (VERDICT r4 weak #6).  Standalone per-stage programs carry the axon
    ~2-4 ms dispatch floor — ranking is reliable, absolutes are upper
    bounds (see tools/profile_phases.py / memory notes)."""
    from quadruped_tpu.physics import forward as F
    from quadruped_tpu.physics.constraint import assemble
    from quadruped_tpu.physics.kinematics import fk
    from quadruped_tpu.physics.smooth import smooth_dynamics
    from quadruped_tpu.physics.solver import solve

    m, pl_ = env.m, env.pipeline

    def timeit(fn, args):
        out = fn(*args)
        float(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]))
        return (time.perf_counter() - t0) / iters, out

    keys = jax.random.split(jax.random.PRNGKey(7), NUM_ENVS)
    st = tpu_jit(jax.vmap(env.reset))(keys)
    st = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, st)
    qpos, qvel, params = st.qpos, st.qvel, st.params
    ctrl = jnp.zeros((NUM_ENVS, env.nu), jnp.float32)
    warm = jnp.zeros_like(qvel)

    phases = {}
    try:
        jfk = tpu_jit(jax.vmap(lambda qp, qv: fk(m, qp, qv)))
        t, kin = timeit(jfk, (qpos, qvel))
        phases["fk_ms"] = round(t * 1e3, 2)
        jsm = tpu_jit(jax.vmap(
            lambda pr, k, qp, qv, c: smooth_dynamics(m, pr, k, qp, qv, c)))
        t, sm = timeit(jsm, (params, kin, qpos, qvel, ctrl))
        phases["smooth_ms"] = round(t * 1e3, 2)
        M_, _L, _qs, qacc_s, _qa = sm
        jasm = tpu_jit(jax.vmap(
            lambda k, qp, qv: assemble(m, pl_.layout, pl_.table, k, qp, qv)))
        t, efc = timeit(jasm, (kin, qpos, qvel))
        phases["assemble_ms"] = round(t * 1e3, 2)
        jsolve = tpu_jit(jax.vmap(
            lambda Mm, qa, e, w: solve(m, Mm, qa, e, warmstart=w)))
        t, (qacc_, _qf, con_f) = timeit(jsolve, (M_, qacc_s, efc, warm))
        phases["solve_ms"] = round(t * 1e3, 2)
        jcfrc = tpu_jit(jax.vmap(
            lambda pr, k, e, f_: F.cfrc_ext(pl_, pr, k, e, f_)))
        t, _ = timeit(jcfrc, (params, kin, efc, con_f))
        phases["cfrc_ms"] = round(t * 1e3, 2)
        jint = tpu_jit(jax.vmap(
            lambda pr, qp, qv, qa, Mm: F.integrate(pl_, pr, qp, qv, qa, Mm)))
        t, _ = timeit(jint, (params, qpos, qvel, qacc_, M_))
        phases["integrate_ms"] = round(t * 1e3, 2)
    except Exception as e:  # never let the breakdown kill the metric
        phases["error"] = str(e)[:160]
    return phases


def main():
    variables, state, obs, step = build()
    rng = jax.random.PRNGKey(2)

    # compile + warmup (also pays any first-use device cost)
    for _ in range(WARMUP):
        state, obs, rng, r = step(variables, state, obs, rng)
    float(jax.device_get(r))  # hard sync

    windows = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(TIMED_STEPS):
            state, obs, rng, r = step(variables, state, obs, rng)
        float(jax.device_get(r))  # hard sync
        dt = time.perf_counter() - t0
        windows.append(NUM_ENVS * TIMED_STEPS / dt)

    med = sorted(windows)[len(windows) // 2]
    spread_pct = 100.0 * (max(windows) - min(windows)) / med

    phases = {}
    if os.environ.get("QTPU_BENCH_PHASES", "1") == "1":
        it = os.environ.get("QTPU_SOLVER_ITERS", "8")
        pools = os.environ.get("QTPU_POOLS", "8,28,12")
        env = Go1Env(Go1Config(
            ctrl_type="torque",
            solver_iterations=int(it) if it else None,
            contact_pools=(
                tuple(int(x) for x in pools.split(",")) if pools else None
            ),
        ))
        phases = _phase_breakdown(env)

    print(
        json.dumps(
            {
                "metric": f"env_steps_per_sec_per_chip_{NUM_ENVS}envs",
                "value": round(med, 1),
                "unit": "control steps/s (10 physics substeps each)",
                "vs_baseline": round(med / BASELINE, 4),
                "windows_steps_per_sec": [round(w, 1) for w in windows],
                "spread_pct": round(spread_pct, 2),
                "timed_steps_per_window": TIMED_STEPS,
                # per-substep stage timings: dispatch-floor-bounded but
                # rank-stable — the attribution record for regressions
                "phases_ms_per_substep": phases,
                # solver profile of record: results measured at different
                # profiles are different workloads (8 warm iterations =
                # the accuracy-measured training profile, PLAN.md drift
                # tables; round-1 BENCH numbers were at 15)
                "solver_iterations": int(
                    os.environ.get("QTPU_SOLVER_ITERS", "8")
                ),
                "contact_pools": os.environ.get("QTPU_POOLS", "8,28,12") or None,
            }
        )
    )


if __name__ == "__main__":
    main()
