"""Benchmark: TPU framework vs the reference implementation on this machine.

Headline metric: COMPOSITE speedup vs the reference CPU — the geometric mean
of four per-axis ratios (backward-pass throughput, full-solve latency,
single-instance MPC step latency, batched solves/s), so the reported
vs_baseline is not the single most favorable axis (VERDICT r1 item 8).
Reference CPU denominators are self-measured (BASELINE.md "Self-measured
reference numbers"); the formula is documented there.  Also reports an
explicit VPU-utilization estimate for the headline kernel.

Prints exactly ONE JSON line to stdout; secondary metrics go to stderr.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Reference implementation measured on THIS machine's CPU (BASELINE.md).
REFERENCE_BACKWARD_TIMESTEPS_PER_S = 90457.0   # jitted backward scan, N=500
REFERENCE_FULL_SOLVE_S = 1.462                 # DP open loop, maxiter=200
REFERENCE_MPC_STEP_S = 0.03054                 # pendulum MPC, horizon 200
REFERENCE_BATCHED_SOLVES_PER_S = 71.6          # DP N=128 maxiter=10, serial

# VPU fp32 peak used for the utilization estimate (TPU v5e: 4 MXU-adjacent
# vector units, ~4e12 f32 op/s — the scaling-book number for v5e VPU).
VPU_PEAK_F32 = 4.0e12


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import ilqr_tpu as it
    from ilqr_tpu.ops.linearize import linearize_trajectory
    from ilqr_tpu.ops.parallel_riccati import backward_pass_associative
    from ilqr_tpu.ops.riccati import backward_pass

    dev = jax.devices()[0]
    log = lambda **kw: print(json.dumps(kw), file=sys.stderr)
    log(device=str(dev), backend=jax.default_backend())

    sys_ = it.make_double_pendulum(
        0.01, [jnp.pi, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.1, 0.1])),
        R=jnp.diag(jnp.array([0.1, 0.1])),
        Q_f=jnp.diag(jnp.array([1000.0, 1000.0, 100.0, 100.0])),
        d1=0.1, d2=0.1, theta1=1 / 12, theta2=1 / 12, integrator="euler",
    )

    # --- Headline: backward-pass timesteps/s/chip (fused Pallas kernel:
    # element build + suffix scan + closure + gains in ONE kernel), long
    # horizon (BASELINE.json config 5 is the 100k-step stretch).  The
    # reference's jitted sequential backward pass is N-independent per step
    # on CPU (61-75k t/s measured at N=500/4096/32768 — BASELINE.md). ---
    from ilqr_tpu.ops.pallas_riccati import (
        backward_pass_pallas,
        backward_pass_pallas_fused,
    )

    def expansion(N):
        U = 0.1 * jnp.sin(jnp.linspace(0, 20.0, N))[:, None] * jnp.ones((1, 2))
        X, _ = jax.jit(lambda u: it.rollout(sys_, jnp.zeros(4), u))(U)
        exp = jax.jit(lambda x, u: linearize_trajectory(sys_, x, u))(X, U)
        return jax.block_until_ready(exp)

    bp_fused = jax.jit(lambda e: backward_pass_pallas_fused(e, 0.0))
    bp_pallas = jax.jit(lambda e: backward_pass_pallas(e, 0.0))
    bp_pscan = jax.jit(lambda e: backward_pass_associative(e, 0.0))
    bp_scan = jax.jit(lambda e: backward_pass(e, 0.0))

    N_head = 131072
    exp_head = expansion(N_head)
    t_head = timeit(bp_fused, exp_head)
    tps = N_head / t_head
    log(metric="backward_pass_fused_ms", value=t_head * 1e3, N=N_head)
    # VPU-utilization estimate for the headline kernel: the fused kernel's
    # own cost model ((n_sweeps+1) combines/step, ~40·n_x³ f32 ops each —
    # ops/pallas_riccati.py cost_estimate) against the v5e VPU f32 peak.
    n_x_h = 4
    n_sweeps_h = (8 * 1024 - 1).bit_length() + 2
    kernel_flops = (n_sweeps_h + 1) * N_head * 40 * n_x_h**3
    vpu_util = kernel_flops / t_head / VPU_PEAK_F32
    log(metric="vpu_utilization_estimate", value=round(vpu_util, 4),
        flops_model="(n_sweeps+1)*N*40*n_x^3", peak_f32=VPU_PEAK_F32)

    # Secondaries at the medium horizon: all four backends.
    N = 4096
    exp = expansion(N)
    t_fused = timeit(bp_fused, exp)
    t_pallas = timeit(bp_pallas, exp)
    t_pscan = timeit(bp_pscan, exp)
    t_scan = timeit(bp_scan, exp)
    log(metric="backward_pass_fused_ms", value=t_fused * 1e3, N=N)
    log(metric="backward_pass_pallas_ms", value=t_pallas * 1e3, N=N)
    log(metric="backward_pass_pscan_ms", value=t_pscan * 1e3, N=N)
    log(metric="backward_pass_scan_ms", value=t_scan * 1e3, N=N)

    # --- Secondary: n_x=6 backward pass (quadrotor) — the fused sublane-
    # packed kernel must beat the sequential scan beyond the toy dims
    # (VERDICT r1 item 3; 'auto' selects pallas for n_x<=8, N>=256). ---
    from ilqr_tpu.models.quadrotor import hover_controls, make_quadrotor

    sys_q = make_quadrotor(
        0.01, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0],
        Q=jnp.diag(jnp.array([1.0, 1.0, 0.1, 0.1, 0.1, 0.1])),
        R=0.1 * jnp.eye(2),
        Q_f=jnp.diag(jnp.array([100.0, 100.0, 10.0, 10.0, 10.0, 10.0])),
    )
    N_q = 8192
    U_q = jnp.broadcast_to(hover_controls(sys_q.params), (N_q, 2))
    X_q, _ = jax.jit(lambda u: it.rollout(sys_q, jnp.zeros(6), u))(U_q)
    exp_q = jax.block_until_ready(
        jax.jit(lambda x, u: linearize_trajectory(sys_q, x, u))(X_q, U_q))
    t_q_fused = timeit(bp_fused, exp_q)
    t_q_scan = timeit(bp_scan, exp_q)
    log(metric="backward_pass_nx6_fused_ms", value=t_q_fused * 1e3, N=N_q,
        n_x=6)
    log(metric="backward_pass_nx6_scan_ms", value=t_q_scan * 1e3, N=N_q,
        n_x=6)

    # --- Secondary: full solve latency (reference workload, N=500). ---
    N_dp = 500
    cfg = it.IlqrConfig(maxiter=200, tol=1e-6)
    solve_fn = jax.jit(
        lambda x0, U0: it.solve(sys_, x0, U0, cfg).cost
    )
    t_solve = timeit(solve_fn, jnp.zeros(4), jnp.zeros((N_dp, 2)), reps=3)
    log(metric="double_pendulum_full_solve_s", value=t_solve,
        reference_cpu_s=1.462)

    # --- Secondary: parallel-in-time line search (shared Pallas affine scan)
    # vs the vmapped sequential rollouts, long horizon. ---
    from ilqr_tpu.ops.parallel_rollout import linesearch_defect_rollouts
    from ilqr_tpu.ops.riccati import backward_pass as bp_seq
    from ilqr_tpu.ops.rollout import linesearch_rollouts

    N_ls = 100_000
    U_ls = jnp.zeros((N_ls, 2))
    X_ls, _ = jax.jit(lambda u: it.rollout(sys_, jnp.zeros(4), u))(U_ls)
    exp_ls = jax.block_until_ready(
        jax.jit(lambda x, u: linearize_trajectory(sys_, x, u))(X_ls, U_ls)
    )
    uff_ls, K_ls, _, _ = jax.block_until_ready(
        jax.jit(lambda e: bp_seq(e, 0.0))(exp_ls)
    )
    alphas = jnp.asarray([0.5**i for i in range(10)])
    ls_seq = jax.jit(lambda: linesearch_rollouts(
        sys_, jnp.zeros(4), alphas, X_ls, U_ls, uff_ls, K_ls)[2])
    ls_def = jax.jit(lambda: linesearch_defect_rollouts(
        sys_, jnp.zeros(4), alphas, X_ls, U_ls, uff_ls, K_ls, exp_ls,
        iters=8)[2])
    t_ls_seq = timeit(ls_seq, reps=5)
    t_ls_def = timeit(ls_def, reps=5)
    log(metric="linesearch_sequential_ms", value=t_ls_seq * 1e3, N=N_ls)
    log(metric="linesearch_defect_pallas_ms", value=t_ls_def * 1e3, N=N_ls)

    # --- Secondary: control-limited backward — sequential per-step boxQP vs
    # the frozen-active-set parallel pass (VERDICT r1 item 6). ---
    from ilqr_tpu.ops.limited_parallel import backward_pass_limited_parallel
    from ilqr_tpu.ops.riccati import backward_pass_limited

    N_lim = 32768
    sys_pl = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                              R=jnp.eye(1), Q_f=jnp.zeros((2, 2)), d=0.0,
                              integrator="rk4")
    U_lim = jnp.clip(
        2.5 * jnp.sin(jnp.linspace(0, 40, N_lim))[:, None], -2.0, 2.0)
    X_lim, _ = jax.jit(lambda u: it.rollout(sys_pl, jnp.zeros(2), u))(U_lim)
    exp_lim = jax.block_until_ready(jax.jit(
        lambda x, u: linearize_trajectory(sys_pl, x, u))(X_lim, U_lim))
    lo_l, hi_l = jnp.array([-2.0]), jnp.array([2.0])
    lb_seq = jax.jit(lambda e, u: backward_pass_limited(
        e, u, lo_l, hi_l, 0.0)[0])
    lb_par = jax.jit(lambda e, u: backward_pass_limited_parallel(
        e, u, lo_l, hi_l, 0.0)[0])
    t_lb_seq = timeit(lb_seq, exp_lim, U_lim, reps=5)
    t_lb_par = timeit(lb_par, exp_lim, U_lim, reps=5)
    log(metric="limited_backward_sequential_ms", value=t_lb_seq * 1e3, N=N_lim)
    log(metric="limited_backward_parallel_ms", value=t_lb_par * 1e3, N=N_lim)

    # --- Secondary: parallel-in-time INITIAL rollout vs sequential chain. ---
    from ilqr_tpu.ops.parallel_rollout import open_loop_defect_rollout

    ro_seq = jax.jit(lambda u: it.rollout(sys_, jnp.zeros(4), u)[1])
    ro_def = jax.jit(lambda u: open_loop_defect_rollout(
        sys_, jnp.zeros(4), u, iters=8)[1])
    t_ro_seq = timeit(ro_seq, U_ls, reps=5)
    t_ro_def = timeit(ro_def, U_ls, reps=5)
    log(metric="initial_rollout_sequential_ms", value=t_ro_seq * 1e3, N=N_ls)
    log(metric="initial_rollout_defect_ms", value=t_ro_def * 1e3, N=N_ls)

    # --- Secondary: long-horizon multiple-shooting solve (every stage
    # parallel-in-time: fused backward + affine update + defect init). ---
    from ilqr_tpu.shooting import MsConfig, solve_ms

    N_ms = 100_000
    sys_p = it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=jnp.zeros((2, 2)), d=0.0, integrator="rk4",
    )
    cfg_ms = it.IlqrConfig(maxiter=60, tol=1e-5, backward="pallas",
                           init_rollout="defect")
    ms_fn = jax.jit(lambda x: solve_ms(
        sys_p, x, jnp.zeros((N_ms, 1)), config=cfg_ms,
        ms=MsConfig(update_engine="pallas")).cost)
    t_ms = timeit(ms_fn, jnp.array([1.0, 0.0]), reps=3)
    log(metric="multiple_shooting_solve_100k_ms", value=t_ms * 1e3, N=N_ms)

    # --- Secondary: batched solves/s (BASELINE config 4 throughput). ---
    B, N_b = 1024, 128
    x0s = jnp.zeros((B, 4)).at[:, 0].add(jnp.linspace(0, 0.5, B))
    cfg_b = it.IlqrConfig(maxiter=10, tol=1e-5, backward="scan")
    batched = jax.jit(
        jax.vmap(lambda x0: it.solve(sys_, x0, jnp.zeros((N_b, 2)), cfg_b).cost)
    )
    t_b = timeit(batched, x0s, reps=3)
    log(metric="batched_solves_per_s", value=B / t_b, B=B, N=N_b)

    # --- Secondary: batched closed-loop MPC step-solves/s. ---
    from ilqr_tpu.mpc import run_mpc_batched

    B_m, N_h, N_sim = 512, 64, 50
    x0m = jnp.zeros((B_m, 4)).at[:, 1].add(jnp.linspace(-0.3, 0.3, B_m))
    cfg_m = it.IlqrConfig(maxiter=5, tol=1e-4)
    mpc = jax.jit(
        lambda xs: run_mpc_batched(
            sys_, sys_, xs, jnp.zeros((N_h, 2)), N_sim, cfg_m
        ).cost
    )
    t_m = timeit(mpc, x0m, reps=2, warmup=1)
    batched_solves_per_s = B / t_b
    log(metric="batched_mpc_step_solves_per_s", value=B_m * N_sim / t_m,
        B=B_m, N_sim=N_sim, horizon=N_h)

    # --- Single-instance MPC step latency (the reference's actual use case:
    # pendulum, horizon N=200, maxiter=10, warm-started — run_iLQR_MPC.py:
    # 145-148 prints 30.5 ms/step on this CPU).  Measured for the standard
    # loop and the RTI variant (one backward+rollout per step); the better
    # one is the composite's MPC axis. ---
    from ilqr_tpu.mpc import run_mpc, run_mpc_rti

    sys_pend_s = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                                  R=jnp.eye(1), Q_f=jnp.zeros((2, 2)), d=0.01,
                                  integrator="backward_euler")
    sys_pend_p = it.make_pendulum(0.01, [jnp.pi, 0.0], Q=jnp.eye(2),
                                  R=jnp.eye(1), Q_f=jnp.zeros((2, 2)), d=0.01,
                                  integrator="midpoint")
    N_sim_1, H = 400, 200
    # run_mpc/_rti auto-resolve to the parallel-in-time inner chains on TPU
    # (mpc._mpc_auto_config — measured 0.59/0.32 ms/step vs 8.0/7.2
    # sequential).  Cap scan unroll for these composite programs: their
    # XLA compile time is pathological at unroll=16 (~35 min through the
    # axon tunnel) for a few-percent runtime difference.
    os.environ["ILQR_TPU_SCAN_UNROLL"] = "4"
    cfg_1 = it.IlqrConfig(maxiter=10, tol=1e-5)
    mpc_1 = jax.jit(lambda x: run_mpc(
        sys_pend_s, sys_pend_p, x, jnp.zeros((H, 1)), N_sim_1, cfg_1).cost)
    x0_1 = jnp.array([1.0, 0.0])
    t_mpc = timeit(mpc_1, x0_1, reps=3, warmup=1) / N_sim_1
    log(metric="mpc_step_latency_ms", value=t_mpc * 1e3, N_sim=N_sim_1,
        horizon=H, mode="full")
    # RTI proper: ONE Newton (iLQR) iteration per solve, warm-started.
    cfg_rti = it.IlqrConfig(maxiter=1, tol=1e-5)
    rti_1 = jax.jit(lambda x: run_mpc_rti(
        sys_pend_s, sys_pend_p, x, jnp.zeros((H, 1)), N_sim_1, cfg_rti).cost)
    t_rti = timeit(rti_1, x0_1, reps=3, warmup=1) / N_sim_1
    log(metric="mpc_step_latency_ms", value=t_rti * 1e3, N_sim=N_sim_1,
        horizon=H, mode="rti")
    del os.environ["ILQR_TPU_SCAN_UNROLL"]
    # RTI counts only if the closed loop still reaches the same quality.
    c_full, c_rti = float(mpc_1(x0_1)), float(rti_1(x0_1))
    log(metric="mpc_closed_loop_cost", full=c_full, rti=c_rti)
    t_mpc_best = min(t_mpc, t_rti) if c_rti <= 1.05 * c_full else t_mpc

    # --- Composite: geometric mean of the four per-axis speedups
    # (BASELINE.md documents the formula + denominators). ---
    r_backward = tps / REFERENCE_BACKWARD_TIMESTEPS_PER_S
    r_solve = REFERENCE_FULL_SOLVE_S / t_solve
    r_mpc = REFERENCE_MPC_STEP_S / t_mpc_best
    r_batched = batched_solves_per_s / REFERENCE_BATCHED_SOLVES_PER_S
    composite = (r_backward * r_solve * r_mpc * r_batched) ** 0.25

    print(json.dumps({
        "metric": "composite_speedup_vs_reference_cpu",
        "value": round(composite, 2),
        "unit": "x (geomean: backward, solve, mpc_step, batched)",
        "vs_baseline": round(composite, 3),
        "components": {
            "backward_pass_x": round(r_backward, 1),
            "full_solve_x": round(r_solve, 1),
            "mpc_step_x": round(r_mpc, 1),
            "batched_solves_x": round(r_batched, 1),
        },
        "backward_pass_timesteps_per_sec_per_chip": round(tps, 1),
        "vpu_utilization_estimate": round(vpu_util, 3),
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon-tunnel processes hang at normal interpreter exit


if __name__ == "__main__":
    main()
