"""Headline benchmark: ICM refinement throughput (frames/s per iteration).

Prints ONE JSON line:
  {"metric": "icm_refine_frames_per_s", "value": ..., "unit": "frames/s",
   "vs_baseline": ...}

Baseline (BASELINE.md): the reference Python pipeline refines at ~127
frames/s per ICM iteration on one CPU core.  vs_baseline = ours / 127.

Runs the production configuration (float32, batched red-black sweep,
L=1024) on the full 1833-frame dataset; compile time excluded by warmup.
Default knobs = the MAX profile (1 red-black pair, 1 LM iteration) — the
fastest profile whose on-chip ATE stays under the 0.1 m gate on BOTH
datasets at N=30 (late-round-4 frontier sweep: 818k/826k frames/s, ATE
0.0449 ijac2018 / 0.0421 palomar, census 11/11; the same both-datasets-
green policy that made turbo the round-4 default).  --profile turbo
(1 pass, 3 LM: 635.8k f/s driver-captured, ATE 0.037/0.053) and fast
(1 pass, 6 LM: 472.5k, ATE 0.033/0.035) keep wider margins; --passes 2
--gn-iters 8 is the conservative engine default (256k f/s, ATE
0.012/0.017).  The gn-depth presets reach different ICM fixed points on
hard OOD worlds — true of EVERY profile step including turbo-vs-fast
(benchmarks/ood_fuzz.py --baseline; docs/RESULTS.md) — so the real-
dataset ATE gate, self-reported in the JSON line on every capture, is
the operative quality contract.

This module is the single source of truth; ``bench.py`` at the repo root
(the driver's entry point) and ``icm-slam-tpu bench`` (installed package)
both dispatch here.
"""
import argparse
import json
import os
import sys
import time

BASELINE_FPS = 127.0
_GOLDEN = {
    "ijac2018": "ijac2018_T1833_N30_inconsistent.npz",
    "palomar": "palomar_T1833_N30_inconsistent.npz",
}


def _emit_tpu_error(detail: str) -> None:
    """One structured JSON line on stdout — never a raw traceback.

    A dead axon tunnel must leave the driver's perf record with a parseable
    {"error": "tpu_unavailable"} marker instead of `parsed: null`
    (the round-2 capture failed exactly that way)."""
    print(json.dumps({
        "metric": "icm_refine_frames_per_s",
        "error": "tpu_unavailable",
        "detail": detail,
    }), flush=True)


def _guard_tpu_backend() -> int:
    """Fail fast when the axon TPU tunnel is down. Returns 0 if healthy.

    The axon PJRT plugin BLOCKS forever at backend init when the tunnel
    relay is dead (no listener on its local port) instead of raising — so
    (1) probe the relay's TCP listener first, and (2) guard the actual
    backend init with a watchdog thread.  Non-axon platforms return
    immediately (jax.devices() errors normally there).
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return 0
    import socket
    port = int(os.environ.get("ICM_AXON_PROBE_PORT", "8082"))
    s = socket.socket()
    s.settimeout(2.0)
    try:
        s.connect(("127.0.0.1", port))
    except OSError as e:
        _emit_tpu_error(
            f"axon tunnel relay not listening on 127.0.0.1:{port} ({e}); "
            f"the TPU backend would block forever at init")
        return 2
    finally:
        s.close()

    import threading
    import jax
    ready = threading.Event()

    def _watchdog():
        if not ready.wait(120.0):
            _emit_tpu_error(
                "TPU backend init did not complete within 120 s "
                "(relay listening but backend unresponsive)")
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        jax.devices()
    except Exception as e:
        _emit_tpu_error(f"{type(e).__name__}: {str(e)[:300]}")
        return 2
    finally:
        ready.set()
    return 0


def _golden_path(dataset: str):
    """tests/golden/ trace for the full-depth ATE self-check, if present."""
    name = _GOLDEN.get(dataset)
    if name is None:
        return None
    here = os.path.dirname(os.path.abspath(__file__))
    for root in (os.path.normpath(os.path.join(here, "..", "..")),
                 os.getcwd()):
        p = os.path.join(root, "tests", "golden", name)
        if os.path.exists(p):
            return p
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ijac2018",
                    help="ijac2018 | palomar")
    ap.add_argument("--mode", default="batched")
    ap.add_argument("--iters", type=int, default=30,
                    help="sweeps per timed loop call (30 = the reference "
                         "config's own N; also amortizes the ~10-30 ms "
                         "per-call tunnel dispatch jitter)")
    ap.add_argument("--reps", type=int, default=5,
                    help="timed loop calls (chained state); the reported "
                         "time is the median rep")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--profile",
                    choices=["fast", "default", "turbo", "ultra", "max"],
                    default=None,
                    help="validated knob preset: max = --passes 1 "
                         "--gn-iters 1 (the bench default; ATE "
                         "0.042-0.045), ultra = 1 x 2 (ATE 0.036-0.040), "
                         "turbo = 1 x 3 (ATE 0.037-0.053), fast = 1 x 6 "
                         "(ATE 0.033-0.035), default = --passes 2 "
                         "--gn-iters 8 (ATE 0.012-0.017); explicit "
                         "--passes/--gn-iters win")
    ap.add_argument("--passes", type=int, default=None,
                    help="red-black half-pass pairs per sweep (1 = the "
                         "turbo/fast profiles; 2 = the conservative "
                         "engine default, ATE 0.012-0.017 m)")
    ap.add_argument("--gn-iters", type=int, default=None,
                    help="LM iterations per pose solve "
                         "(3 turbo / 6 fast / 8 default)")
    ap.add_argument("--jacobi", action="store_true",
                    help="pose_update=jacobi: one full Jacobi pass per "
                         "pose_pass instead of a red-black Gauss-Seidel "
                         "pair — half the sequential LM depth, but "
                         "measured SLOWER than red-black on chip (r4: "
                         "418.6k vs 472.5k f/s at gn=6; 523.8k vs 635.8k "
                         "at gn=3), so red-black stays the default")
    ap.add_argument("--pallas", action="store_true",
                    help="use the Pallas correspondence kernel (opt-in; "
                         "measured neutral vs XLA fusion at reference AND "
                         "20k-frame stress scale)")
    ap.add_argument("--pallas-fused", action="store_true",
                    help="use the fused association+sums Pallas kernel "
                         "(opt-in A/B; ops/assoc_sums_pallas.py)")
    ap.add_argument("--fleet", type=int, default=8,
                    help="also measure fleet mode: the refine loop vmapped "
                         "over this many replicated worlds in one program "
                         "(solver.icm.run_batched's inner path).  Default "
                         "8 = the measured knee of the scaling curve "
                         "(benchmarks/fleet_curve.py: 1.74-1.82x aggregate "
                         "across profiles); 0 disables the row")
    ap.add_argument("--no-palomar", action="store_true",
                    help="skip the secondary palomar row (added to the "
                         "same JSON line when the primary dataset is "
                         "ijac2018 at full depth)")
    args = ap.parse_args(argv)

    import jax
    done = None
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        rc = _guard_tpu_backend()
        if rc:
            return rc
        # whole-run deadman: backend init can succeed and the FIRST device
        # op still hang forever (a held single-tenant chip, CLAUDE.md).
        # Whatever happens, the driver's capture must end with one
        # structured JSON line, never an empty timeout.
        import threading
        done = threading.Event()
        # default below tools/remeasure.sh's per-job `timeout 600` so a
        # mid-run device stall still ends with one structured JSON line
        # instead of being killed silently by the outer harness timeout
        deadman_s = float(os.environ.get("ICM_BENCH_DEADMAN_S", "480"))

        def _deadman():
            if not done.wait(deadman_s):
                _emit_tpu_error(
                    f"bench did not complete within {deadman_s:.0f} s "
                    f"(backend initialized but a device op stalled — "
                    f"likely a held chip or dead tunnel mid-run)")
                os._exit(3)

        threading.Thread(target=_deadman, daemon=True).start()

    try:
        return _run_and_report(args, done)
    except SystemExit:
        raise
    except Exception as e:
        if done is None:          # CPU path: a traceback is fine/debuggable
            raise
        # TPU path contract: the driver capture ALWAYS ends with one
        # parseable JSON line, even on a device error after backend init
        _emit_tpu_error(f"{type(e).__name__}: {str(e)[:300]}")
        return 2
    finally:
        if done is not None:
            done.set()            # disarm the deadman on every exit path


def _run_and_report(args, done):
    res = _bench_dataset(args.dataset, args, reps=max(1, args.reps))
    out = {
        "metric": "icm_refine_frames_per_s",
        "value": round(res["fps"], 1),
        "unit": "frames/s",
        "vs_baseline": round(res["fps"] / BASELINE_FPS, 2),
    }
    if res["ate"] is not None:
        out["ate_vs_reference_m_at_n30"] = round(res["ate"], 4)
    if res.get("fleet_fps"):
        out["fleet_worlds"] = args.fleet
        out["fleet_frames_per_s"] = round(res["fleet_fps"], 1)
        out["fleet_speedup_vs_single"] = round(res["fleet_fps"] / res["fps"],
                                               2)
    if args.dataset != "ijac2018":
        out["dataset"] = args.dataset
    elif not (args.frames or args.no_palomar):
        # second dataset, same JSON line (driver contract: ONE line).  The
        # palomar arrays share ijac2018's shapes, so every program is
        # already compiled — this costs ~1 s of pure runtime and gives the
        # second dataset a driver-captured perf+ATE record each round.
        try:
            import copy
            # the fleet block only reports for the primary dataset —
            # don't silently re-run the W-world measurement here
            pargs = copy.copy(args)
            pargs.fleet = 0
            p = _bench_dataset("palomar", pargs, reps=max(1, args.reps // 2))
            out["palomar_frames_per_s"] = round(p["fps"], 1)
            if p["ate"] is not None:
                out["palomar_ate_vs_reference_m_at_n30"] = round(p["ate"], 4)
        except Exception as e:  # secondary row must never kill the capture
            out["palomar_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out))


def _bench_dataset(dataset: str, args, reps: int):
    """Measure one dataset: init time, refine throughput, ATE at N=30."""
    import jax
    import jax.numpy as jnp

    from icm_slam_tpu.config import ICMConfig
    from icm_slam_tpu.data.datasets import load
    from icm_slam_tpu.solver.icm import (_filter_jit, _init_jit,
                                         _refine_loop_jit, hoist_compaction,
                                         prepare, resolve_config, seed_map)

    ds = load(dataset)
    if args.frames:
        ds = ds.slice(args.frames)
    T = ds.T
    # no --profile -> max, the fastest both-datasets-green profile
    # (late-round-4 on-chip frontier sweep; ATE self-reported below keeps
    # every capture honest)
    preset_p, preset_g = {"default": (2, 8), "fast": (1, 6),
                          "turbo": (1, 3), "ultra": (1, 2)}.get(
        args.profile, (1, 1))
    passes = preset_p if args.passes is None else args.passes
    gn_iters = preset_g if args.gn_iters is None else args.gn_iters
    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = ICMConfig(N=args.iters, L=1024, sweep_mode=args.mode,
                    dtype="float32",
                    use_pallas_assoc=on_tpu and args.pallas,
                    use_pallas_fused_assoc=on_tpu and args.pallas_fused,
                    pose_update="jacobi" if getattr(args, "jacobi", False)
                    else "redblack",
                    pose_passes=passes, pose_gn_iters=gn_iters)

    data = prepare(ds, cfg)
    cfg = resolve_config(cfg, data)
    x0 = jnp.asarray(ds.x0, data.dist.dtype)
    seed = seed_map(data, x0, cfg)

    # --- init sweep (iteration 0) ---
    t0 = time.perf_counter()
    state, x, _ = _init_jit(data, seed, x0, cfg)
    jax.block_until_ready(x)
    init_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, x, _ = _init_jit(data, seed, x0, cfg)
    jax.block_until_ready(x)
    init_s = time.perf_counter() - t0
    cur_map = _filter_jit(state, cfg)

    # the same loop-invariant compaction hoist run() applies between init
    # and refinement — without it every timed rep re-runs the (T, B)
    # validity sort inside the fused program (production parity)
    data = hoist_compaction(data, cfg)

    # --- refinement sweeps: warmup (compile) then timed fused loop ---
    # the production path (run() with no per-iteration observer) executes
    # all N iterations as ONE device program; honest timing: state evolves
    # every iteration inside the scan, nothing is re-fed
    # metric definition: pure sweep throughput (no per-iteration L×L
    # convergence diagnostics), same as the reference baseline's timing
    m_w, x_w, _, _ = _refine_loop_jit(data, cur_map, x, cfg, args.iters,
                                      with_metrics=False)
    jax.block_until_ready(x_w)

    # chained-median protocol (icm_slam_tpu.benchmarks.timing): every
    # timed call consumes the previous call's output through a fresh
    # buffer, median rep reported
    from icm_slam_tpu.benchmarks.timing import timed_chained_median_s

    def _step(m, x_in):
        m2, x2, _, _ = _refine_loop_jit(data, m, x_in, cfg, args.iters,
                                        with_metrics=False)
        return m2, x2

    med_s, _, _ = timed_chained_median_s(_step, m_w, x_w, reps)
    refine_s = med_s / args.iters

    fps = T / refine_s

    # --- optional fleet row: W worlds through one vmapped refine loop ---
    fleet_fps = None
    if getattr(args, "fleet", 0) and args.fleet > 1:
        W = args.fleet
        rep = lambda a: jnp.stack([a] * W)
        data_b = jax.tree.map(rep, data)
        map_b = jax.tree.map(rep, m_w)
        x_b = rep(x_w)

        @jax.jit
        def fleet_loop(d, mm, xs):
            return jax.vmap(lambda di, mi, xi: _refine_loop_jit(
                di, mi, xi, cfg, args.iters, with_metrics=False))(d, mm, xs)

        mb, xb, _, _ = fleet_loop(data_b, map_b, x_b)
        jax.block_until_ready(xb)
        from icm_slam_tpu.benchmarks.timing import timed_chained_median_s
        med_s, _, _ = timed_chained_median_s(
            lambda mm, xs: fleet_loop(data_b, mm, xs)[:2], mb, xb, reps)
        fleet_fps = W * T / (med_s / args.iters)

    # quality self-check: the reported key is ATE at EXACTLY the golden
    # trace's N=30 sweeps past init.  When the timed loop already ran 30
    # (the default) its warmup output is that state; any other --iters gets
    # a dedicated 30-sweep run from the init state so the key never lies.
    ate = None
    gp = None if args.frames else _golden_path(dataset)
    if gp:
        import numpy as np
        if args.iters == 30:
            x30 = x_w
        else:
            _, x30, _, _ = _refine_loop_jit(data, cur_map, x, cfg, 30,
                                            with_metrics=False)
        gx = np.load(gp)["x"].T
        xn = np.asarray(x30)
        ate = float(np.mean(np.linalg.norm(xn[:, :2] - gx[:, :2], axis=1)))

    if args.verbose:
        print(f"# device={jax.devices()[0]} mode={args.mode} T={T} "
              f"dataset={ds.name}", file=sys.stderr)
        print(f"# init: {init_s:.3f}s ({T / init_s:.0f} f/s, compile "
              f"{init_compile_s:.1f}s); refine: {refine_s * 1e3:.1f} ms/iter",
              file=sys.stderr)
    return {"fps": fps, "ate": ate, "init_s": init_s,
            "refine_s_per_iter": refine_s, "fleet_fps": fleet_fps}


if __name__ == "__main__":
    sys.exit(main())
