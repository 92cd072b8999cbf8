"""Benchmark: TPU framework vs the reference implementation on this machine.

Headline metric: COMPOSITE speedup vs the reference CPU — the geometric mean
of four per-axis ratios (backward-pass throughput, full-solve latency,
single-instance MPC step latency, batched solves/s), so the reported
vs_baseline is not the single most favorable axis (VERDICT r1 item 8).
Reference CPU denominators are self-measured (BASELINE.md "Self-measured
reference numbers"); the formula is documented there.

Timing methodology (v2, round 3): on this axon tunnel `block_until_ready`
does NOT reliably wait for device execution (measured: 20 chained 4k
matmuls "complete" in 0.03 ms ≈ 4800 TFLOP/s, impossible), and fetching a
host scalar costs a ~20-30 ms round trip.  Every measurement therefore
(a) forces completion by fetching a scalar reduction computed INSIDE the
jitted program, and (b) either subtracts the independently measured fetch
RTT (long programs) or repeats the kernel R times inside one program with a
false data dependency and takes the slope between two R values (short
kernels — cancels RTT and dispatch exactly).  Minimum over repetitions.
The round-1/2 artifacts were taken with block-based timing; the cross-round
table printed at the end compares like axes but flags the method change.

Prints exactly ONE JSON line to stdout; secondary metrics go to stderr.
"""
import glob
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp

# Reference implementation measured on THIS machine's CPU (BASELINE.md).
REFERENCE_BACKWARD_TIMESTEPS_PER_S = 90457.0   # jitted backward scan, N=500
REFERENCE_FULL_SOLVE_S = 1.462                 # DP open loop, maxiter=200
REFERENCE_MPC_STEP_S = 0.03054                 # pendulum MPC, horizon 200
REFERENCE_BATCHED_SOLVES_PER_S = 71.6          # DP N=128 maxiter=10, serial

# VPU fp32 FMA peak used for the utilization estimate (TPU v5e: 8 sublanes
# x 128 lanes x 4 ALUs x ~0.94 GHz x 2 ops/FMA ~ 7.7e12; round-3 slope-timed
# kernels measured ~1.08x the old non-FMA 4e12 figure, i.e. the model was
# undercounting the denominator by the FMA factor).
VPU_PEAK_F32 = 7.7e12


def log(**kw):
    print(json.dumps(kw), file=sys.stderr, flush=True)


def _scalarize(out):
    """Reduce an arbitrary output pytree to one f32 scalar (same program)."""
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    acc = jnp.float32(0.0)
    for l in leaves:
        acc = acc + jnp.sum(jnp.asarray(l, jnp.float32))
    return acc


def measure_rtt(reps=15):
    """Execute-and-fetch round-trip floor of the device tunnel."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def fetch_timeit(fn, *args, reps=8, warmup=2, rtt=0.0):
    """min over reps of (call + scalar fetch) − locally measured RTT.

    The trivial-program fetch is INTERLEAVED with the measured program so
    the subtracted RTT reflects the tunnel's state at measurement time —
    the startup RTT drifts by several ms over a bench run, which made
    10-15 ms measurements swing ±30% between runs.  The `rtt` argument is
    kept as a floor for callers that already measured it."""
    timed = jax.jit(lambda *a: _scalarize(fn(*a)))
    triv = jax.jit(lambda x: x + 1.0)
    x0 = jnp.float32(0.0)
    float(triv(x0))
    for _ in range(warmup):
        float(timed(*args))
    ts, tt = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(triv(x0))
        tt.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(timed(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - min(min(tt), rtt if rtt else min(tt)), 1e-9)


def slope_timeit(fn, args, reps=5, target_work_s=0.15, r_cap=4096, **_legacy):
    """Per-call kernel time via in-program repetition: run the kernel R times
    inside one jitted lax.scan, fetch the final scalar, and take the slope
    between R=1 and an adaptively chosen R₂.  RTT and dispatch cancel in
    the slope.

    Iterations are chained by perturbing one input leaf with
    `carry * 1e-20` — a REAL data dependency XLA cannot fold (the carry is a
    runtime value) with no numerical effect on O(1) f32 data.  The constant
    must be a NORMAL f32: with a subnormal (1e-38) the TPU's flush-to-zero
    lets the compiler canonicalize the product to 0 and hoist the kernel
    out of the loop.  Neither `carry * 0` (algebraic simplifier) nor
    `lax.optimization_barrier` (ties values operand-wise, inputs stay
    loop-invariant) stops loop-invariant code motion either — all three
    were measured collapsing an 8192-step backward pass to "0.05 ms".

    R₂ is chosen so the extra work is ≥ `target_work_s`, well above the
    several-ms RTT jitter of the tunnel: these kernels run in tens of µs
    (a 4096-step fused backward: ~60 µs), so a fixed small R₂ leaves the
    slope buried in fetch noise.  The two programs' repetitions are also
    interleaved so slow RTT drift hits both equally."""
    flat, tree = jax.tree_util.tree_flatten(args)
    fi = next(i for i, l in enumerate(flat)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))

    def repeated(R):
        def run(*leaves):
            def body(c, _):
                leaves2 = list(leaves)
                leaves2[fi] = leaves2[fi] + (
                    c * jnp.float32(1e-20)).astype(leaves2[fi].dtype)
                out = fn(*jax.tree_util.tree_unflatten(tree, leaves2))
                return c + _scalarize(out), None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
            return tot
        return jax.jit(run)

    # Pilot: upper-bound the per-call time with a medium R, pick R2 from it.
    r1, r_pilot = 1, 32
    pilot = repeated(r_pilot)
    float(pilot(*flat))
    t0 = time.perf_counter()
    float(pilot(*flat))
    t_call_ub = max((time.perf_counter() - t0) / r_pilot, 2e-6)
    r2 = int(min(r_cap, max(r_pilot, target_work_s / t_call_ub)))

    progs = {r1: repeated(r1), r2: repeated(r2) if r2 != r_pilot else pilot}
    for R in (r1, r2):
        for _ in range(2):
            float(progs[R](*flat))
    t = {r1: [], r2: []}
    for _ in range(reps):
        for R in (r1, r2):
            t0 = time.perf_counter()
            float(progs[R](*flat))
            t[R].append(time.perf_counter() - t0)
    return max((min(t[r2]) - min(t[r1])) / (r2 - r1), 1e-9)


def load_prior_rounds():
    """Parse BENCH_r*.json driver artifacts → {round: {key: value}}."""
    out = {}
    for path in sorted(glob.glob("BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            art = json.load(open(path))
        except Exception:
            continue
        metrics = {}
        for line in art.get("tail", "").splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except Exception:
                continue
            name = d.get("metric")
            if not name:
                continue
            key = name
            if "N" in d:
                key += f"@N{d['N']}"
            if "system" in d:
                key += f"@{d['system']}"
            if "mode" in d:
                key += f"@{d['mode']}"
            if "value" in d:
                metrics[key] = d["value"]
            if name == "composite_speedup_vs_reference_cpu":
                for ax, v in d.get("components", {}).items():
                    metrics[f"component:{ax}"] = v
        if metrics:
            out[rnd] = metrics
    return out


def regression_table(current, prior):
    """Emit per-axis deltas vs every prior round; flag >10% losses."""
    for rnd in sorted(prior):
        rows = {}
        for key, now in current.items():
            then = prior[rnd].get(key)
            if then is None or not then:
                continue
            higher_is_better = "per_s" in key or "component" in key
            ratio = (now / then) if higher_is_better else (then / now)
            rows[key] = {
                "now": round(now, 4), "then": round(then, 4),
                "speedup_vs_then": round(ratio, 3),
                "regressed": bool(ratio < 0.9),
            }
        log(metric="cross_round_deltas", vs_round=rnd,
            note="round>=3 uses RTT-corrected timing; earlier artifacts "
                 "include tunnel latency in short-kernel numbers",
            rows=rows)


def main():
    import ilqr_tpu as it
    from ilqr_tpu.ops.linearize import linearize_trajectory
    from ilqr_tpu.ops.parallel_riccati import backward_pass_associative
    from ilqr_tpu.ops.riccati import backward_pass

    dev = jax.devices()[0]
    log(device=str(dev), backend=jax.default_backend())
    rtt = measure_rtt()
    log(metric="tunnel_execute_fetch_rtt_ms", value=rtt * 1e3)

    current = {}  # key -> value, for the cross-round table

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

    def expansion(sys_e, n_x, N, U):
        X, _ = jax.jit(lambda u: it.rollout(sys_e, jnp.zeros(n_x), u))(U)
        exp = jax.jit(lambda x, u: linearize_trajectory(sys_e, x, u))(X, U)
        return jax.block_until_ready(exp)

    def dp_expansion(N):
        U = 0.1 * jnp.sin(jnp.linspace(0, 20.0, N))[:, None] * jnp.ones((1, 2))
        return expansion(sys_, 4, N, U)

    bp_fused = lambda e: backward_pass_pallas_fused(e, 0.0)
    bp_pallas = lambda e: backward_pass_pallas(e, 0.0)
    bp_pscan = lambda e: backward_pass_associative(e, 0.0)
    bp_scan = lambda e: backward_pass(e, 0.0)

    N_head = 131072
    exp_head = dp_expansion(N_head)
    t_head = slope_timeit(bp_fused, (exp_head,), r1=1, r2=5)
    tps = N_head / t_head
    log(metric="backward_pass_fused_ms", value=t_head * 1e3, N=N_head)
    current["backward_pass_fused_ms@N131072"] = t_head * 1e3

    # VPU utilization, two ways: (a) modeled — the kernel's own cost model
    # ((n_sweeps+1) combines/step, ~40·n_x³ f32 ops each); (b) measured —
    # XLA's compiled cost analysis of the same program (compiler-counted
    # FLOPs; includes only ops XLA attributes FLOPs to, so Pallas kernels
    # report via their cost estimate) divided by the slope-timed kernel
    # latency and the v5e VPU f32 peak.
    n_x_h = 4
    from ilqr_tpu.ops.pallas_riccati import _sub_blocking

    l_blk_h, _ = _sub_blocking(N_head + 1)
    n_sweeps_h = (8 * l_blk_h - 1).bit_length() + 2
    kernel_flops = (n_sweeps_h + 1) * N_head * 40 * n_x_h**3
    vpu_util = kernel_flops / t_head / VPU_PEAK_F32
    log(metric="vpu_utilization_estimate", value=round(vpu_util, 4),
        flops_model="(n_sweeps+1)*N*40*n_x^3", peak_f32=VPU_PEAK_F32)
    measured_util = None
    try:
        ca = jax.jit(bp_fused).lower(exp_head).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        xla_flops = float(ca.get("flops", 0.0))
        if xla_flops > 0:
            measured_util = xla_flops / t_head / VPU_PEAK_F32
            log(metric="vpu_utilization_xla_measured",
                value=round(measured_util, 4), xla_flops=xla_flops,
                note="compiled-executable cost analysis / slope-timed latency")
    except Exception as e:  # axon remote-compile may not expose analysis
        log(metric="vpu_utilization_xla_measured", error=str(e)[:200])

    # (c) profiler-measured: capture a hardware trace of the headline
    # program and read the device-time breakdown from the xplane (VERDICT
    # r2 item 5 — a counter-backed utilization figure, not a model).  The
    # program device time independently validates the slope timing; the
    # Pallas custom-call's own duration gives the in-kernel utilization
    # (the gap to the program time is the XLA pack/unpack around it).
    try:
        import glob as _glob
        import shutil
        import tempfile

        from jax.profiler import ProfileData

        tracedir = tempfile.mkdtemp(prefix="ilqr_bench_trace_")
        prog = jax.jit(bp_fused)
        float(jnp.sum(prog(exp_head)[0]))
        with jax.profiler.trace(tracedir):
            for _ in range(5):
                float(jnp.sum(prog(exp_head)[0]))
        pd = ProfileData.from_file(_glob.glob(
            tracedir + "/**/*.xplane.pb", recursive=True)[0])
        t_prog = t_kernel = 0.0
        n_prog = 0
        for plane in pd.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                for ev in line.events:
                    if line.name == "XLA Modules" and "reduce_sum" not in ev.name:
                        t_prog += ev.duration_ns
                        n_prog += 1
                    if "_fused_backward_packed" in ev.name:
                        t_kernel += ev.duration_ns
        shutil.rmtree(tracedir, ignore_errors=True)
        if n_prog and t_kernel:
            t_prog_ms = t_prog / n_prog / 1e6
            t_kern_ms = t_kernel / n_prog / 1e6
            util_prof = kernel_flops / (t_kern_ms * 1e-3) / VPU_PEAK_F32
            log(metric="device_time_profiled",
                fused_program_ms=round(t_prog_ms, 4),
                fused_kernel_ms=round(t_kern_ms, 4),
                vpu_utilization_profiled_kernel=round(util_prof, 4),
                n_calls=n_prog, N=N_head)
            current["device_time_fused_kernel_ms@N131072"] = t_kern_ms
    except Exception as e:
        log(metric="device_time_profiled", error=str(e)[:200])

    # Secondaries at the medium horizon: all four backends (slope-timed).
    N = 4096
    exp = dp_expansion(N)
    t_fused = slope_timeit(bp_fused, (exp,))
    t_pallas = slope_timeit(bp_pallas, (exp,))
    t_pscan = slope_timeit(bp_pscan, (exp,))
    t_scan = slope_timeit(bp_scan, (exp,), r1=1, r2=3)
    log(metric="backward_pass_fused_ms", value=t_fused * 1e3, N=N)
    log(metric="backward_pass_pallas_ms", value=t_pallas * 1e3, N=N)
    log(metric="backward_pass_pscan_ms", value=t_pscan * 1e3, N=N)
    log(metric="backward_pass_scan_ms", value=t_scan * 1e3, N=N)
    current["backward_pass_fused_ms@N4096"] = t_fused * 1e3
    current["backward_pass_pallas_ms@N4096"] = t_pallas * 1e3
    current["backward_pass_pscan_ms@N4096"] = t_pscan * 1e3
    current["backward_pass_scan_ms@N4096"] = t_scan * 1e3

    # --- Secondary: n_x=6 backward pass (planar quadrotor) — the fused
    # sublane-packed kernel must beat the sequential scan beyond toy dims
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
    exp_q = expansion(sys_q, 6, N_q, U_q)
    t_q_fused = slope_timeit(bp_fused, (exp_q,))
    t_q_scan = slope_timeit(bp_scan, (exp_q,), r1=1, r2=3)
    log(metric="backward_pass_nx6_fused_ms", value=t_q_fused * 1e3, N=N_q,
        n_x=6)
    log(metric="backward_pass_nx6_scan_ms", value=t_q_scan * 1e3, N=N_q,
        n_x=6)
    current["backward_pass_nx6_fused_ms@N8192"] = t_q_fused * 1e3
    current["backward_pass_nx6_scan_ms@N8192"] = t_q_scan * 1e3

    # --- Secondary: n_x=12 backward pass (3-D quadrotor — the dimension
    # where round 2's fast paths silently fell back to the O(N) scan;
    # VERDICT r2 item 2's done-criterion asks for >=5x scan here).  Measured
    # r3 dev run: fused 0.88 ms vs scan 106.6 ms at N=8192 (121x). ---
    from ilqr_tpu.models.quadrotor3d import (
        default_weights as _q3w,
        hover_controls as _q3h,
        make_quadrotor3d as _mk_q3,
    )

    Q3b, R3b, Qf3b = _q3w()
    sys_q3b = _mk_q3(0.02, [1.0, 1.0, 1.0] + [0.0] * 9, Q3b, R3b, Qf3b)
    N_q3 = 8192
    U_q3 = jnp.broadcast_to(_q3h(sys_q3b.params), (N_q3, 4)) + \
        0.05 * jnp.sin(jnp.linspace(0, 40, N_q3))[:, None]
    exp_q3 = expansion(sys_q3b, 12, N_q3, U_q3)
    t_q3_fused = slope_timeit(bp_fused, (exp_q3,))
    t_q3_scan = slope_timeit(bp_scan, (exp_q3,), reps=3)
    log(metric="backward_pass_nx12_fused_ms", value=t_q3_fused * 1e3, N=N_q3,
        n_x=12)
    log(metric="backward_pass_nx12_scan_ms", value=t_q3_scan * 1e3, N=N_q3,
        n_x=12)
    current["backward_pass_nx12_fused_ms@N8192"] = t_q3_fused * 1e3
    current["backward_pass_nx12_scan_ms@N8192"] = t_q3_scan * 1e3

    # --- Secondary: n_x=16 backward pass (rotor-lag 3-D quadrotor) — the
    # round-4 cap lift (VERDICT r3 weak #6): the fused kernel must beat the
    # XLA associative scan at manipulator-class dims, and 'auto' routes to
    # it through n_x <= 16. ---
    from ilqr_tpu.models.quadrotor3d import make_quadrotor3d_rotor

    hov = 0.25 * 0.5 * 9.81
    tgt16 = [1.0, 0.5, 1.0] + [0.0] * 9 + [hov] * 4
    Q16 = jnp.diag(jnp.asarray([1.0] * 3 + [0.5] * 3 + [0.1] * 6
                               + [0.01] * 4))
    sys_q4 = make_quadrotor3d_rotor(0.005, tgt16, Q16, 0.1 * jnp.eye(4),
                                    10.0 * Q16)
    N_q4 = 8192
    U_q4 = jnp.broadcast_to(jnp.full((4,), hov), (N_q4, 4))
    exp_q4 = expansion(sys_q4, 16, N_q4, U_q4)
    t_q4_fused = slope_timeit(bp_fused, (exp_q4,))
    t_q4_pscan = slope_timeit(bp_pscan, (exp_q4,))
    log(metric="backward_pass_nx16_fused_ms", value=t_q4_fused * 1e3,
        N=N_q4, n_x=16)
    log(metric="backward_pass_nx16_pscan_ms", value=t_q4_pscan * 1e3,
        N=N_q4, n_x=16)
    current["backward_pass_nx16_fused_ms@N8192"] = t_q4_fused * 1e3
    current["backward_pass_nx16_pscan_ms@N8192"] = t_q4_pscan * 1e3

    # --- Secondary: full solve latency (reference workload, N=500). ---
    N_dp = 500
    cfg = it.IlqrConfig(maxiter=200, tol=1e-6)
    t_solve = fetch_timeit(
        lambda x0, U0: it.solve(sys_, x0, U0, cfg).cost,
        jnp.zeros(4), jnp.zeros((N_dp, 2)), reps=8, rtt=rtt)
    log(metric="double_pendulum_full_solve_s", value=t_solve,
        reference_cpu_s=1.462)
    current["double_pendulum_full_solve_s"] = t_solve

    # --- Secondary: parallel-in-time line search (shared Pallas affine scan)
    # vs the vmapped sequential rollouts, long horizon. ---
    from ilqr_tpu.ops.parallel_rollout import linesearch_defect_rollouts
    from ilqr_tpu.ops.rollout import linesearch_rollouts

    N_ls = 100_000
    U_ls = jnp.zeros((N_ls, 2))
    X_ls, _ = jax.jit(lambda u: it.rollout(sys_, jnp.zeros(4), u))(U_ls)
    exp_ls = jax.block_until_ready(
        jax.jit(lambda x, u: linearize_trajectory(sys_, x, u))(X_ls, U_ls)
    )
    uff_ls, K_ls, _, _ = jax.block_until_ready(
        jax.jit(lambda e: backward_pass(e, 0.0))(exp_ls)
    )
    alphas = jnp.asarray([0.5**i for i in range(10)])
    t_ls_seq = fetch_timeit(
        lambda X, U: linesearch_rollouts(
            sys_, jnp.zeros(4), alphas, X, U, uff_ls, K_ls)[2],
        X_ls, U_ls, reps=4, rtt=rtt)
    t_ls_def = fetch_timeit(
        lambda X, U: linesearch_defect_rollouts(
            sys_, jnp.zeros(4), alphas, X, U, uff_ls, K_ls, exp_ls,
            iters=8)[2],
        X_ls, U_ls, reps=4, rtt=rtt)
    log(metric="linesearch_sequential_ms", value=t_ls_seq * 1e3, N=N_ls)
    log(metric="linesearch_defect_pallas_ms", value=t_ls_def * 1e3, N=N_ls)
    current["linesearch_sequential_ms@N100000"] = t_ls_seq * 1e3
    current["linesearch_defect_pallas_ms@N100000"] = t_ls_def * 1e3

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
    exp_lim = expansion(sys_pl, 2, N_lim, U_lim)
    lo_l, hi_l = jnp.array([-2.0]), jnp.array([2.0])
    t_lb_seq = fetch_timeit(
        lambda e, u: backward_pass_limited(e, u, lo_l, hi_l, 0.0)[0],
        exp_lim, U_lim, reps=4, rtt=rtt)
    t_lb_par = slope_timeit(
        lambda e, u: backward_pass_limited_parallel(e, u, lo_l, hi_l, 0.0)[0],
        (exp_lim, U_lim), r1=2, r2=26)
    log(metric="limited_backward_sequential_ms", value=t_lb_seq * 1e3, N=N_lim)
    log(metric="limited_backward_parallel_ms", value=t_lb_par * 1e3, N=N_lim)
    current["limited_backward_sequential_ms@N32768"] = t_lb_seq * 1e3
    current["limited_backward_parallel_ms@N32768"] = t_lb_par * 1e3

    # --- Secondary: limited-DDP composition (VERDICT r2 item 3) — the
    # second-order terms now ride the frozen-active-set parallel pass.
    # Measured r3 dev run: 0.42 ms vs 213.7 ms sequential (514x); the full
    # torque-limited DDP solve at N=32k: 2.8 ms vs 409 ms, same cost. ---
    from ilqr_tpu.ops.linearize import dynamics_hessians

    X_lim, _ = jax.jit(lambda u: it.rollout(sys_pl, jnp.zeros(2), u))(U_lim)
    hess_lim = jax.block_until_ready(jax.jit(
        lambda x, u: dynamics_hessians(sys_pl, x, u))(X_lim, U_lim))
    t_ld_seq = fetch_timeit(
        lambda e, u: backward_pass_limited(
            e, u, lo_l, hi_l, 0.0, hess=hess_lim)[0],
        exp_lim, U_lim, reps=4, rtt=rtt)
    t_ld_par = slope_timeit(
        lambda e, u: backward_pass_limited_parallel(
            e, u, lo_l, hi_l, 0.0, hess=hess_lim, engine="pallas")[0],
        (exp_lim, U_lim))
    log(metric="limited_ddp_backward_sequential_ms", value=t_ld_seq * 1e3,
        N=N_lim)
    log(metric="limited_ddp_backward_parallel_ms", value=t_ld_par * 1e3,
        N=N_lim)
    current["limited_ddp_backward_sequential_ms@N32768"] = t_ld_seq * 1e3
    current["limited_ddp_backward_parallel_ms@N32768"] = t_ld_par * 1e3

    # --- Secondary: parallel-in-time INITIAL rollout vs sequential chain. ---
    from ilqr_tpu.ops.parallel_rollout import open_loop_defect_rollout

    t_ro_seq = fetch_timeit(lambda u: it.rollout(sys_, jnp.zeros(4), u)[1],
                            U_ls, reps=3, rtt=rtt)
    # Slope-timed: the defect rollout is faster than the RTT jitter, so
    # fetch-RTT subtraction can go negative.
    t_ro_def = slope_timeit(
        lambda u: open_loop_defect_rollout(sys_, jnp.zeros(4), u, iters=8)[1],
        (U_ls,), r1=1, r2=5)
    log(metric="initial_rollout_sequential_ms", value=t_ro_seq * 1e3, N=N_ls)
    log(metric="initial_rollout_defect_ms", value=t_ro_def * 1e3, N=N_ls)
    current["initial_rollout_defect_ms@N100000"] = t_ro_def * 1e3

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
    t_ms = fetch_timeit(
        lambda x: solve_ms(sys_p, x, jnp.zeros((N_ms, 1)), config=cfg_ms,
                           ms=MsConfig(update_engine="pallas")).cost,
        jnp.array([1.0, 0.0]), reps=4, rtt=rtt)
    log(metric="multiple_shooting_solve_100k_ms", value=t_ms * 1e3, N=N_ms)
    current["multiple_shooting_solve_100k_ms@N100000"] = t_ms * 1e3

    # --- Secondary: batched solves/s (BASELINE config 4 throughput). ---
    B, N_b = 1024, 128
    x0s = jnp.zeros((B, 4)).at[:, 0].add(jnp.linspace(0, 0.5, B))
    cfg_b = it.IlqrConfig(maxiter=10, tol=1e-5, backward="scan")
    t_b = fetch_timeit(
        jax.vmap(lambda x0: it.solve(sys_, x0, jnp.zeros((N_b, 2)), cfg_b).cost),
        x0s, reps=6, rtt=rtt)
    batched_solves_per_s = B / t_b
    log(metric="batched_solves_per_s", value=batched_solves_per_s, B=B, N=N_b)
    current["batched_solves_per_s"] = batched_solves_per_s

    # --- Secondary: batched closed-loop MPC step-solves/s. ---
    from ilqr_tpu.mpc import run_mpc_batched

    B_m, N_h, N_sim = 512, 64, 50
    x0m = jnp.zeros((B_m, 4)).at[:, 1].add(jnp.linspace(-0.3, 0.3, B_m))
    cfg_m = it.IlqrConfig(maxiter=5, tol=1e-4)
    t_m = fetch_timeit(
        lambda xs: run_mpc_batched(
            sys_, sys_, xs, jnp.zeros((N_h, 2)), N_sim, cfg_m).cost,
        x0m, reps=3, warmup=1, rtt=rtt)
    log(metric="batched_mpc_step_solves_per_s", value=B_m * N_sim / t_m,
        B=B_m, N_sim=N_sim, horizon=N_h)
    current["batched_mpc_step_solves_per_s"] = B_m * N_sim / t_m

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
    t_mpc = fetch_timeit(mpc_1, x0_1, reps=4, warmup=1, rtt=rtt) / N_sim_1
    log(metric="mpc_step_latency_ms", value=t_mpc * 1e3, N_sim=N_sim_1,
        horizon=H, mode="full")
    current["mpc_step_latency_ms@full"] = t_mpc * 1e3
    # RTI proper: ONE Newton (iLQR) iteration per solve, warm-started.
    cfg_rti = it.IlqrConfig(maxiter=1, tol=1e-5)
    rti_1 = jax.jit(lambda x: run_mpc_rti(
        sys_pend_s, sys_pend_p, x, jnp.zeros((H, 1)), N_sim_1, cfg_rti).cost)
    t_rti = fetch_timeit(rti_1, x0_1, reps=4, warmup=1, rtt=rtt) / N_sim_1
    log(metric="mpc_step_latency_ms", value=t_rti * 1e3, N_sim=N_sim_1,
        horizon=H, mode="rti")
    current["mpc_step_latency_ms@rti"] = t_rti * 1e3
    del os.environ["ILQR_TPU_SCAN_UNROLL"]
    # RTI counts only if the closed loop still reaches the same quality.
    c_full, c_rti = float(mpc_1(x0_1)), float(rti_1(x0_1))
    log(metric="mpc_closed_loop_cost", full=c_full, rti=c_rti)
    t_mpc_best = min(t_mpc, t_rti) if c_rti <= 1.05 * c_full else t_mpc

    # --- MPC auto-config validation beyond the pendulum (VERDICT r2 item
    # 6): cartpole (drift-prone dynamics — the family that broke the defect
    # path at solver level) and the 3-D quadrotor (n_x=12), auto engines vs
    # the fixed sequential engines.  Auto must be within ~10% of the better
    # one on each system. ---
    os.environ["ILQR_TPU_SCAN_UNROLL"] = "4"
    from ilqr_tpu.models.quadrotor3d import (
        default_weights as q3_weights,
        hover_controls as q3_hover,
        make_quadrotor3d,
    )

    sys_cart = it.make_cartpole(
        0.01, [0.0, jnp.pi, 0.0, 0.0],
        Q=jnp.diag(jnp.array([1.0, 10.0, 0.1, 0.1])), R=0.1 * jnp.eye(1),
        Q_f=jnp.diag(jnp.array([100.0, 500.0, 10.0, 10.0])),
        integrator="rk4")
    Q3, R3, Qf3 = q3_weights()
    sys_q3 = make_quadrotor3d(0.02, [0.5, 0.5, 0.5] + [0.0] * 9, Q3, R3, Qf3)
    cfg_auto = it.IlqrConfig(maxiter=10, tol=1e-5)
    cfg_seq = it.IlqrConfig(maxiter=10, tol=1e-5, rollout="scan",
                            backward="scan", init_rollout="scan")
    mpc_cases = [
        ("cartpole", sys_cart, jnp.array([0.0, 0.3, 0.0, 0.0]),
         jnp.zeros((200, 1)), 200),
        ("quadrotor3d", sys_q3,
         jnp.zeros(12), jnp.broadcast_to(q3_hover(sys_q3.params), (100, 4)),
         150),
    ]
    for name, sys_m, x0_m, U0_m, n_sim_m in mpc_cases:
        for mode, cfg_m2, auto_p in (("auto", cfg_auto, True),
                                     ("sequential", cfg_seq, False)):
            t_m2 = fetch_timeit(
                lambda x, _s=sys_m, _u=U0_m, _n=n_sim_m, _c=cfg_m2,
                _a=auto_p: run_mpc(_s, _s, x, _u, _n, _c,
                                   auto_parallel=_a).cost,
                x0_m, reps=3, warmup=1, rtt=rtt) / n_sim_m
            log(metric="mpc_step_latency_ms", value=t_m2 * 1e3,
                system=name, horizon=U0_m.shape[0], mode=mode)
            current[f"mpc_step_latency_ms@{name}@{mode}"] = t_m2 * 1e3
    del os.environ["ILQR_TPU_SCAN_UNROLL"]

    # --- Composite: geometric mean of the four per-axis speedups
    # (BASELINE.md documents the formula + denominators). ---
    r_backward = tps / REFERENCE_BACKWARD_TIMESTEPS_PER_S
    r_solve = REFERENCE_FULL_SOLVE_S / t_solve
    r_mpc = REFERENCE_MPC_STEP_S / t_mpc_best
    r_batched = batched_solves_per_s / REFERENCE_BATCHED_SOLVES_PER_S
    composite = (r_backward * r_solve * r_mpc * r_batched) ** 0.25
    current["component:backward_pass_x"] = r_backward
    current["component:full_solve_x"] = r_solve
    current["component:mpc_step_x"] = r_mpc
    current["component:batched_solves_x"] = r_batched

    # Cross-round regression table (VERDICT r2 item 1): per-axis deltas vs
    # every prior BENCH_r*.json artifact, >10% losses flagged.
    regression_table(current, load_prior_rounds())

    result = {
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
        "timing_method": "v2: scalar-fetch completion, RTT-corrected / "
                         "in-program slope",
        "tunnel_rtt_ms": round(rtt * 1e3, 2),
    }
    if measured_util is not None:
        result["vpu_utilization_xla_measured"] = round(measured_util, 3)
    print(json.dumps(result))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon-tunnel processes hang at normal interpreter exit


if __name__ == "__main__":
    main()
