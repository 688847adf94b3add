"""Benchmark harness: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: geomorphon classification throughput (Mpix/s) at
lookup_pixels=50 — the reference's headline workload (Poland 30 m
EU-DEM at lookup=50 took ~26-42 min for ~1e8 px on CPU, i.e.
~0.2 Mpix/s; BASELINE.md).  The headline is measured at the matching
reference scale (8192² exact ladder, interior tiles dominant), with
the r1/r2 2048x4096 continuity shape logged alongside and used as the
fallback record if the scale probe fails.  Runs on whatever
jax.devices() provides (the real TPU chip under the driver).

Secondary numbers (printed as comments on stderr): the fast
progressive ladder, point-gridding throughput, SMRF wall time on
ISPRS samp12, springs-inpaint convergence at 4096^2, Gi*/Moran
statistics throughput, the 1x1-mesh sharding overhead, and the
16,384^2 out-of-core mosaic wall-clock.
"""

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 0.2  # reference CPU: ~1e8 px / ~30 min at lookup=50


def _enable_compile_cache():
    """Persistent compilation cache: later bench runs (and rounds)
    skip recompiles of unchanged programs."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:
        log("compile cache unavailable:", e)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _timeit(f, k=5):
    """Robust device timing: a (tiny) host readback terminates the
    chain (block_until_ready alone under-reports through the axon
    tunnel); only 1 element is pulled so transfer cost stays out of
    the measurement."""
    import jax

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.ravel()[:1])

    sync(f())  # warm
    t0 = time.time()
    for _ in range(k - 1):
        f()
    sync(f())
    return (time.time() - t0) / k


BENCH_SHAPE = (2048, 4096)
BENCH_LOOKUP = 50
# reference-scale probe configuration — shared by _pallas_scale_probe
# and _aot_warm_probe so the warmness check can never drift from the
# probe it predicts
SCALE_SHAPE = (8192, 8192)
SCALE_REPS = 6


def _bench_input():
    H, W = BENCH_SHAPE
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(H, W)).astype(np.float32)
    return np.cumsum(Z, axis=0) + np.cumsum(Z, axis=1)


def _repeat_in_one_program(kernel, n, aot_key=None):
    """n kernel applications inside ONE jitted program (lax.scan with a
    data dependence so nothing is CSE'd/DCE'd): a single dispatch, so
    the tunnel's per-roundtrip latency — which ranged 1 ms to 3 s
    across a day of measurements — is paid once, not per iteration.

    ``aot_key``: wrap the program in the persistent executable cache
    (neilpy_tpu.aot) — the Pallas probes' Mosaic compiles run
    server-side, bypass jax's XLA cache, and cost 1-7 min per fresh
    process; with the cache only the first-ever bench run pays them."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def rep(Z):
        def body(z, _):
            g = kernel(z)
            return z + g.astype(jnp.float32).mean() * 1e-12, None
        z, _ = lax.scan(body, Z, None, length=n)
        return z
    if aot_key is not None:
        from neilpy_tpu.aot import CachedKernel
        return CachedKernel(rep, key=("bench_rep", aot_key, n))
    return rep


def _one_program_ms(Zd, kernel, n=8):
    """min-of-3 amortized ms for kernel(Z), timed inside ONE jitted
    program (see _repeat_in_one_program for why)."""
    rep = _repeat_in_one_program(kernel, n)
    np.asarray(rep(Zd).ravel()[:1])
    dts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(rep(Zd).ravel()[:1])
        dts.append((time.time() - t0) / n)
    return min(dts) * 1e3


def _pallas_probe():
    """Entry point run in a SUBPROCESS: the Pallas kernel's Mosaic
    compile at lookup=50 can take tens of minutes on a cold cache, and
    must not be able to sink the whole bench run.  Prints one line
    'PALLAS_MPIX <value>' on success."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.pallas_scan import geomorphons_pallas

    H, W = BENCH_SHAPE
    N = 10
    Zd = jax.device_put(jnp.asarray(_bench_input()))
    rep = _repeat_in_one_program(
        lambda z: geomorphons_pallas(z, cellsize=10,
                                     lookup_pixels=BENCH_LOOKUP), N,
        aot_key=("pallas_exact", BENCH_SHAPE, BENCH_LOOKUP))
    t0 = time.time()
    np.asarray(rep(Zd).ravel()[:1])
    log(f"pallas compile-or-cached-load+first run (x{N} scan): "
        f"{time.time() - t0:.1f}s")
    dts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(rep(Zd).ravel()[:1])
        dts.append((time.time() - t0) / N)
    dt = min(dts)
    print(f"PALLAS_MPIX {H * W / dt / 1e6:.1f}", flush=True)


def _pallas_fast_probe():
    """Like _pallas_probe but for the 'fast' progressive ladder
    (unrolled static slices; O(log R) steps).  Prints
    'PALLAS_FAST_MPIX <value>'."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.pallas_scan import geomorphons_pallas

    H, W = BENCH_SHAPE
    N = 10
    Zd = jax.device_put(jnp.asarray(_bench_input()))
    # specialize=True: the unrolled fast ladder doesn't default to the
    # 9-patch static specialization (its cold Mosaic compile is ~2x,
    # ~754 s) but measures 870 vs 728 Mpix/s at this shape — the
    # persistent executable cache makes the compile a one-time cost,
    # so the bench opts in explicitly
    rep = _repeat_in_one_program(
        lambda z: geomorphons_pallas(z, cellsize=10,
                                     lookup_pixels=BENCH_LOOKUP,
                                     fast=True, specialize=True), N,
        aot_key=("pallas_fast_spec", BENCH_SHAPE, BENCH_LOOKUP))
    t0 = time.time()
    np.asarray(rep(Zd).ravel()[:1])
    log(f"pallas fast compile-or-cached-load+first run (x{N} scan): "
        f"{time.time() - t0:.1f}s")
    dts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(rep(Zd).ravel()[:1])
        dts.append((time.time() - t0) / N)
    dt = min(dts)
    print(f"PALLAS_FAST_MPIX {H * W / dt / 1e6:.1f}", flush=True)


def _run_probe(entry, tag, budget, attempts=1):
    """Run ``bench.<entry>()`` in a SUBPROCESS and parse its
    '<tag> <value>' stdout line.  Every expensive probe runs behind
    this watchdog — r4's driver bench died because ONE in-process
    compile+first-run blocked for 999 s on a degraded tunnel before
    any record had printed.  ``attempts`` > 1 retries on failure,
    SHARING the single budget (deadline-based): the retry exists for
    transient weather and must not double the worst-case
    time-to-first-record."""
    import os
    import subprocess
    deadline = time.time() + budget
    for k in range(attempts):
        remaining = deadline - time.time()
        if remaining <= 10:
            log(f"{entry}: budget exhausted before attempt "
                f"{k + 1}/{attempts}")
            break
        try:
            proc = subprocess.run(
                [sys.executable, "-c", f"import bench; bench.{entry}()"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=remaining)
            if proc.stderr:
                for ln in proc.stderr.splitlines():
                    if not ln.startswith("WARNING:"):
                        log(f"  [{entry}] {ln}")
            for line in proc.stdout.splitlines():
                if line.startswith(tag):
                    return float(line.split()[1])
            log(f"{entry} produced no {tag} line "
                f"(attempt {k + 1}/{attempts})")
        except subprocess.TimeoutExpired:
            log(f"{entry} exceeded its {budget}s budget "
                f"(attempt {k + 1}/{attempts})")
        except Exception as e:
            log(f"{entry} failed:", str(e)[:200])
    return None


def _xla_probe():
    """XLA-engine exact geomorphons at the continuity shape, fully
    jitted (lower/compile/first-run phases logged separately so a
    tunnel-weather stall is attributable — r4 logged a single opaque
    '999.3s').  Prints 'XLA_MPIX <value>'."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.visibility import geomorphons

    H, W = BENCH_SHAPE
    lookup = BENCH_LOOKUP
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(H, W)).astype(np.float32)
    Z = np.cumsum(Z, axis=0) + np.cumsum(Z, axis=1)
    t0 = time.time()
    Zd = jax.device_put(jnp.asarray(Z))
    np.asarray(Zd.ravel()[:1])
    log(f"xla probe upload: {time.time() - t0:.1f}s")
    fn = jax.jit(lambda z: geomorphons(z, cellsize=10,
                                       lookup_pixels=lookup,
                                       threshold_angle=1, engine="xla"))
    t0 = time.time()
    lowered = fn.lower(Zd)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    np.asarray(compiled(Zd).ravel()[:1])
    t3 = time.time()
    log(f"xla lower {t1 - t0:.1f}s, compile {t2 - t1:.1f}s, first run "
        f"{t3 - t2:.1f}s (true cold compile of the scan ladder is ~3 s "
        f"on a healthy link; r4's '999.3s' was tunnel weather)")
    ms = _one_program_ms(
        Zd, lambda z: geomorphons(z, cellsize=10, lookup_pixels=lookup,
                                  threshold_angle=1, engine="xla"), n=8)
    mpix = H * W / ms / 1e3
    log(f"xla geomorphons {H}x{W} lookup={lookup}: {ms:.1f} ms "
        f"= {mpix:.0f} Mpix/s (in-one-program)")
    print(f"XLA_MPIX {mpix:.1f}", flush=True)


def _xla_probe_small():
    """Last-resort record source: the XLA ladder at a small shape (a
    few seconds end-to-end even on a sick tunnel).  Prints
    'XLA_SMALL_MPIX <value>'."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.visibility import geomorphons

    H, W = 1024, 2048
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(H, W)).astype(np.float32).cumsum(axis=0)
    Zd = jax.device_put(jnp.asarray(Z))
    kern = lambda z: geomorphons(z, cellsize=10,
                                 lookup_pixels=BENCH_LOOKUP,
                                 threshold_angle=1, engine="xla")
    np.asarray(kern(Zd).ravel()[:1])
    ms = _one_program_ms(Zd, kern, n=6)
    print(f"XLA_SMALL_MPIX {H * W / ms / 1e3:.1f}", flush=True)


def _selftest_probe():
    """tests/test_bench.py hook: a trivial probe that succeeds fast."""
    log("selftest stderr line")
    print("SELFTEST 42.5", flush=True)


def _selftest_sleep_probe():
    """tests/test_bench.py hook: a probe that outlives any sane
    deadline (exercises the shared-budget timeout path)."""
    time.sleep(60)
    print("SELFTEST_SLEEP 1.0", flush=True)


def _aot_warm_probe():
    """Subprocess entry: prints 'AOT_WARM 1' when the 8192²
    exact-ladder probe would LOAD its executable from the persistent
    AOT cache (seconds) instead of paying a cold Mosaic compile
    (~15 min server-side).  Runs in a subprocess because the check
    itself initializes the tunneled backend (jax.devices()) — on a
    dead tunnel even that can hang, and it must not be able to block
    the record (r4's lesson)."""
    from neilpy_tpu import aot
    # MUST mirror _pallas_scale_probe's _repeat_in_one_program call:
    # CachedKernel key = ("bench_rep", aot_key, n)
    key = ("bench_rep", ("pallas_exact", SCALE_SHAPE, BENCH_LOOKUP),
           SCALE_REPS)
    warm = aot.is_cached(key, [(SCALE_SHAPE, "float32")])
    print(f"AOT_WARM {int(warm)}", flush=True)


def _aot_scale_warm():
    v = _run_probe("_aot_warm_probe", "AOT_WARM", 120)
    return bool(v)


def bench_fast_ladder():
    """The reference's documented `fast` progressive ladder (geometric
    L levels) at the continuity shape — secondary number (the baseline
    comparison is against the reference's EXACT ladder throughput).
    Runs after the headline JSON is printed.  Budget 1500 s: the
    specialized unrolled ladder's COLD Mosaic compile is ~754 s."""
    import os
    import jax
    if jax.default_backend() != "tpu":
        return
    fbudget = int(os.environ.get("PALLAS_FAST_BENCH_TIMEOUT", "1500"))
    v = _run_probe("_pallas_fast_probe", "PALLAS_FAST_MPIX", fbudget)
    if v is not None:
        log(f"pallas geomorphons fast ladder: {v:.0f} Mpix/s "
            "(secondary; headline is the exact ladder)")


def bench_scale(budget=None):
    """Reference-scale exact ladder (8192² — the baseline workload,
    the reference's 42-min Poland EU-DEM run, is ~1e8 px, so this is
    the shape the headline should be measured at; interior tiles
    dominate and the 2048x4096 continuity shape's boundary-tile
    premium disappears).  Returns the Mpix/s value, or None if the
    probe fails.  Default budget 1800 s: the COLD 8192² compile is 9
    Mosaic programs at the big shape, measured >900 s server-side;
    warm (AOT-cached) runs load in seconds — callers pass a short
    budget when `_aot_scale_warm()` says the executable is on disk."""
    import os
    import jax
    if jax.default_backend() != "tpu":
        return None
    sbudget = budget if budget is not None else int(
        os.environ.get("PALLAS_SCALE_BENCH_TIMEOUT", "1800"))
    v = _run_probe("_pallas_scale_probe", "PALLAS_SCALE_MPIX", sbudget)
    if v is not None:
        log(f"pallas geomorphons exact 8192x8192: {v:.0f} Mpix/s "
            f"(reference-scale)")
    return v


def _pallas_scale_probe():
    """Exact ladder at reference scale (8192², interior tiles dominate
    — the reference's Poland workload is ~10⁸ px): prints
    'PALLAS_SCALE_MPIX <value>'.  Run in a subprocess like the other
    Pallas probes (own Mosaic compile, ~250 s cold)."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.pallas_scan import geomorphons_pallas

    N_SIDE = SCALE_SHAPE[0]
    N = SCALE_REPS
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(N_SIDE, N_SIDE)).astype(np.float32).cumsum(axis=0)
    Zd = jax.device_put(jnp.asarray(Z))
    rep = _repeat_in_one_program(
        lambda z: geomorphons_pallas(z, cellsize=10,
                                     lookup_pixels=BENCH_LOOKUP), N,
        aot_key=("pallas_exact", SCALE_SHAPE, BENCH_LOOKUP))
    t0 = time.time()
    np.asarray(rep(Zd).ravel()[:1])
    log(f"pallas 8192² compile-or-cached-load+first run (x{N} scan): "
        f"{time.time() - t0:.1f}s")
    dts = []
    for _ in range(2):
        t0 = time.time()
        np.asarray(rep(Zd).ravel()[:1])
        dts.append((time.time() - t0) / N)
    dt = min(dts)
    print(f"PALLAS_SCALE_MPIX {N_SIDE * N_SIDE / dt / 1e6:.1f}",
          flush=True)


def bench_gridding():
    """End-to-end lidar gridding: device-resident origin-relative
    coordinates -> fused bin+segment-min program -> materialized grid.
    A 1-element readback terminates the timing chain honestly (the
    axon tunnel's block_until_ready can return before execution)."""
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.pointgrid import (bin_points_device, _grid_fused,
                                          create_dem)

    # 5M points (60 MB on the wire): large enough for a stable
    # steady-state rate, small enough that the tunnel transfer stays
    # tractable on a bad day
    n = 5_000_000
    rng = np.random.default_rng(1)
    x = rng.uniform(500000, 502000, n)
    y = rng.uniform(4200000, 4202000, n)
    z = rng.normal(300, 30, n).astype(np.float32)

    # host leg (f64 origin-shift): best-of-3 — the sandbox host has ONE
    # vCPU shared with unrelated load, and a single contended sample
    # once under-reported this leg 6x (round-2's "57 Mpts/s")
    t_host = min(_best_of(
        lambda: bin_points_device(x, y, cellsize=1), 3))
    xr, yr, (ny, nx), t = bin_points_device(x, y, cellsize=1)

    xr_d = jax.device_put(jnp.asarray(xr))
    yr_d = jax.device_put(jnp.asarray(yr))
    z_d = jax.device_put(jnp.asarray(z))
    inv = jnp.float32(1.0 / t.a)

    def run(method):
        return _grid_fused(xr_d, yr_d, z_d, inv, ny, nx, "min", method)

    # scatter only: the sort alternative measured 4.6x slower on v5e
    # with a 200s+ compile — not worth bench wall-clock
    out = {}
    for method in ("scatter",):
        try:
            dt = _timeit(lambda: run(method), k=12)
            out[method] = n / dt / 1e6
            e2e = n / (t_host + dt) / 1e6
            log(f"gridding {method}: {dt*1e3:.1f} ms = "
                f"{out[method]:.0f} Mpts/s device ({ny}x{nx} grid); "
                f"host leg {n/t_host/1e6:.0f} Mpts/s -> "
                f"END-TO-END {e2e:.0f} Mpts/s (host+device)")
        except Exception as e:
            log(f"gridding {method} failed:", str(e)[:160])
    return max(out.values()) if out else None


def _best_of(fn, k):
    ts = []
    for _ in range(k):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return ts


def bench_inpaint():
    """springs inpaint at mosaic scale: 4096^2, 30% contiguous NaN
    (VERDICT r1 item 6).  Logs iterations + convergence + throughput."""
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.inpaint import inpaint_nans_by_springs

    H = W = 4096
    rng = np.random.default_rng(2)
    Z = rng.normal(size=(H, W)).astype(np.float32)
    Z = np.cumsum(Z, axis=0) + np.cumsum(Z, axis=1)
    Z[900:3200, 800:3000] = np.nan          # 30.2% contiguous hole
    Zd = jax.device_put(jnp.asarray(Z))
    out, info = inpaint_nans_by_springs(Zd, return_info=True)
    np.asarray(out.ravel()[:1])             # warm + correctness sync
    t0 = time.time()
    out, info = inpaint_nans_by_springs(Zd, return_info=True)
    np.asarray(out.ravel()[:1])
    dt = time.time() - t0
    log(f"inpaint springs 4096^2 / 30% contiguous NaN: "
        f"{info['iterations']} CG iterations, converged="
        f"{info['converged']}, {dt:.1f}s = {H*W/dt/1e6:.0f} Mpix/s")
    return info


def _carry_best_ever(record, path):
    """Max-merge the headline into a ``best_ever`` field carried across
    runs of MOSAIC_BENCH.json: the wall number is mostly link weather
    (>3x intra-day swing), and one bad window must not erase a better
    historical record — each run's own attempts stay verbatim."""
    best_ever = dict(record.get("headline") or {},
                     date=record.get("date"))
    try:
        prev = json.load(open(path)).get("best_ever")
        if prev and prev.get("mpix_s", 0) > best_ever.get("mpix_s", 0):
            best_ever = prev
    except (FileNotFoundError, ValueError, KeyError):
        pass
    if best_ever.get("mpix_s"):
        record["best_ever"] = best_ever
    return record


def bench_mosaic():
    """Out-of-core mosaic wall-clock at 16,384² (VERDICT r2 item 1; r4
    items 4 and 8): every configuration runs k attempts and EVERY
    attempt's per-phase breakdown is persisted to MOSAIC_BENCH.json —
    the tunnel's throughput swings >3x within minutes, so the artifact
    itself quantifies the link weather a single number would hide.

    Headline configuration (r4 #4): int16 source + geomorphons+objects
    (2 B/px up, 1 B/px down — products bit-identical to the f32/trio
    kernel path on the same classes).  The classic f32 trio and the
    quantized-uplink variants are recorded alongside."""
    import os
    from neilpy_tpu.pipelines.mosaic import mosaic_terrain_products

    rng = np.random.default_rng(0)
    N = 16384
    Z = rng.standard_normal((N, N), dtype=np.float32).cumsum(axis=0)
    Zi16 = np.clip(np.round(Z), -32000, 32000).astype(np.int16)

    configs = [
        # (name, source, kwargs, attempts, wire bytes/px up+down)
        ("duo_int16", Zi16,
         dict(lookup_pixels=50, windows=5, tile_size=4096,
              products=("geomorphons", "objects")), 2, "2+1"),
        ("trio_f32", Z,
         dict(lookup_pixels=50, windows=5, gi_radius=3,
              tile_size=4096), 2, "4+3"),
        ("trio_f32_moran8", Z,
         dict(lookup_pixels=50, windows=5, gi_radius=3, tile_size=4096,
              float_wire="uint8"), 1, "4+2"),
        ("duo_f32_q16", Z,
         dict(lookup_pixels=50, windows=5, tile_size=4096,
              products=("geomorphons", "objects"),
              upload_dtype="uint16"), 1, "2+1"),
    ]
    record = {"date": time.strftime("%Y-%m-%d"), "side": N,
              "configs": {}}
    for name, src, kw, attempts, wire in configs:
        try:
            t0 = time.time()
            mosaic_terrain_products(src[:4096, :4096], **kw)  # warm
            warm_s = time.time() - t0
            log(f"mosaic[{name}] warmup (1 tile, incl Pallas "
                f"compile-or-load): {warm_s:.1f}s")
            runs = []
            for rep in range(attempts):
                ps = {}
                t0 = time.time()
                mosaic_terrain_products(src, phase_stats=ps, **kw)
                dt = time.time() - t0
                runs.append({
                    "wall_s": round(dt, 1),
                    "mpix_s": round(N * N / dt / 1e6, 1),
                    "phases": {k: round(v, 1)
                               for k, v in sorted(ps.items())}})
                log(f"mosaic[{name}] run{rep}: {dt:.1f}s = "
                    f"{N * N / dt / 1e6:.1f} Mpix/s; "
                    f"phases: {runs[-1]['phases']}")
            best = min(r["wall_s"] for r in runs)
            record["configs"][name] = {
                "wire_bytes_px": wire, "warmup_s": round(warm_s, 1),
                "attempts": runs, "best_s": best,
                "best_mpix_s": round(N * N / best / 1e6, 1)}
        except Exception as e:
            log(f"mosaic[{name}] failed:", str(e)[:200])
            record["configs"][name] = {"error": str(e)[:200]}
    head = record["configs"].get("duo_int16", {})
    if "best_mpix_s" in head:
        record["headline"] = {"config": "duo_int16",
                              "mpix_s": head["best_mpix_s"]}
        log(f"mosaic 16384^2 HEADLINE duo_int16: {head['best_s']}s = "
            f"{head['best_mpix_s']} Mpix/s wall (trio_f32 best: "
            f"{record['configs'].get('trio_f32', {}).get('best_mpix_s')}"
            f" Mpix/s)")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MOSAIC_BENCH.json")
    _carry_best_ever(record, path)
    tmp = path + ".tmp"
    json.dump(record, open(tmp, "w"), indent=1)
    os.replace(tmp, path)
    log(f"mosaic attempts persisted to {path} "
        f"(best_ever: {record.get('best_ever')})")
    return record


def bench_sharded_overhead():
    """sharded_geomorphons on a 1x1 mesh vs the direct kernel (VERDICT
    r1 item 9): measures the per-shard overhead the README's xN
    projection rests on."""
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.visibility import geomorphons
    from neilpy_tpu.dist import make_mesh, sharded_geomorphons

    mesh = make_mesh(shape=(1, 1))
    Zd = jax.device_put(jnp.asarray(_bench_input()))
    kw = dict(cellsize=10, lookup_pixels=BENCH_LOOKUP, threshold_angle=1)
    a = np.asarray(geomorphons(Zd, engine="xla", **kw))
    b = np.asarray(sharded_geomorphons(Zd, mesh=mesh, engine="xla", **kw))
    agree = float(np.mean(a == b))

    # in-one-program timing for BOTH sides: per-dispatch tunnel noise
    # swamped per-call deltas (measured anywhere from -34% to +1%)
    dt_direct = _one_program_ms(Zd, lambda z: geomorphons(
        z, engine="xla", **kw), n=6)
    dt_shard = _one_program_ms(Zd, lambda z: sharded_geomorphons(
        z, mesh=mesh, engine="xla", **kw), n=6)
    log(f"sharded 1x1 mesh overhead: direct {dt_direct:.1f} ms vs "
        f"sharded {dt_shard:.1f} ms "
        f"({100*(dt_shard/dt_direct-1):+.1f}%), agreement {agree}")
    return dt_shard / dt_direct - 1


def bench_stats():
    """Getis-Ord Gi* + local Moran's I throughput (run-decomposed
    sliding sums; the conv lowering measured 222x slower at r=13)."""
    import jax
    import jax.numpy as jnp
    from neilpy_tpu.ops.stats import rasterGi, local_morans_i
    from neilpy_tpu.core.codes import disk

    H, W = BENCH_SHAPE
    Zd = jax.device_put(jnp.asarray(_bench_input()))

    # these kernels run in single-digit ms: per-dispatch tunnel
    # latency would dominate, so amortize inside one program
    for r in (5, 13):
        fp = np.asarray(disk(r))
        dt = _one_program_ms(
            Zd, lambda z, fp=fp: rasterGi(z, footprint=fp, star=True)[0],
            n=10)
        log(f"rasterGi* disk r={r}: {dt:.1f} ms = "
            f"{H*W/dt/1e3:.0f} Mpix/s")
    dt = _one_program_ms(Zd, lambda z: local_morans_i(z, footprint=3),
                         n=10)
    log(f"local Moran's I r=3: {dt:.1f} ms = {H*W/dt/1e3:.0f} Mpix/s")


def bench_smrf():
    import pandas as pd
    from neilpy_tpu.pipelines.smrf import smrf
    fn = "/root/reference/sample_data/samp12.txt"
    try:
        df = pd.read_csv(fn, header=None, names=["x", "y", "z", "g"],
                         delimiter="\t")
    except FileNotFoundError:
        return None
    t0 = time.time()
    _, _, _, pts = smrf(df.x, df.y, df.z, 1, 18, .15, .5, 1.25)
    pts = np.asarray(pts)
    dt = time.time() - t0
    err = 1 - np.mean(pts == df.g)
    log(f"smrf samp12 (52k pts, windows=18): {dt:.1f}s, "
        f"total error {100 * err:.3f}% (published ref: 3.091%)")
    return dt, err


def bench_demo50k_recorded():
    """Report the recorded disk-to-disk scale demonstrations
    (tools/demo_mosaic_50k.py — run separately on hardware because they
    need tens of GB of scratch disk; each DEMO*.json carries the
    cumulative wall across its SIGKILL+resume certification)."""
    import glob
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(here, "DEMO*.json"))):
        d = json.load(open(p))
        side = int(round(d["pixels"] ** 0.5))
        log(f"recorded {side//1000}k^2 disk-to-disk mosaic "
            f"({d['pixels']/1e9:.1f}e9 px, "
            f"products {','.join(d['products'])}, lookup={d['lookup_pixels']}"
            f", tile {d['tile']}): {d['wall_s']:.0f}s = {d['mpix_s']} Mpix/s "
            f"wall incl kill+resume; BigTIFF write {d['bigtiff_s']}s "
            f"({d['date']})")


def _emit_record(mpix_s):
    print(json.dumps({
        "metric": "geomorphons_throughput_lookup50",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 1),
    }), flush=True)


def main():
    """Headline policy (r4 post-mortem: the driver's bench timed out
    with NO parsed record because one in-process compile+first-run
    blocked 999 s on a degraded tunnel before anything printed):

    1. every expensive step runs in a SUBPROCESS behind a watchdog
       budget, with one retry for transient tunnel weather;
    2. a valid headline record prints as early as possible — from the
       8192² reference-scale probe when its executable is AOT-warm
       (the normal driver case, ~1-2 min), else provisionally from the
       cheap XLA-engine measurement (~2-4 min even cold), else from a
       small-shape last resort;
    3. better numbers measured later re-print the record (same metric;
       a parser taking either the first or the last JSON line gets a
       valid record, and on a warm cache the first IS the headline).
    """
    import os
    _enable_compile_cache()
    t_start = time.time()
    best = None         # best measured throughput so far
    emitted = None      # value of the last-printed record

    def emit_if_better(v, source):
        nonlocal best, emitted
        if v is None:
            return
        best = v if best is None else max(best, v)
        if emitted is None or best > emitted:
            log(f"record <- {best:.0f} Mpix/s ({source}) at "
                f"t+{time.time() - t_start:.0f}s")
            _emit_record(best)
            emitted = best

    # 1. warm fast path: real headline in ~1-2 min
    scale = None
    if _aot_scale_warm():
        scale = bench_scale(budget=int(
            os.environ.get("PALLAS_SCALE_FAST_TIMEOUT", "420")))
        emit_if_better(scale, "8192² exact ladder, AOT-warm")
    else:
        log("8192² executable not AOT-cached; deferring the scale "
            "probe until after a provisional record exists")

    # 2. XLA continuity probe — the provisional record on a cold
    #    cache, and an upgrade candidate like any other measurement
    #    (a degraded-window scale number must not shadow a better one)
    xla = _run_probe("_xla_probe", "XLA_MPIX",
                     int(os.environ.get("XLA_BENCH_TIMEOUT", "420")),
                     attempts=2)
    emit_if_better(xla, "XLA engine 2048x4096"
                   + (" (provisional)" if emitted is None else ""))
    if emitted is None:
        # 3. last resort: small-shape XLA (seconds even on a sick link)
        v = _run_probe("_xla_probe_small", "XLA_SMALL_MPIX", 240,
                       attempts=2)
        emit_if_better(v, "XLA engine 1024x2048 (last resort)")
    if emitted is None:
        log("NO record emitted yet — all early probes failed; "
            "continuing to the Pallas probes")

    # 4. Pallas continuity probe, then the full-budget scale probe if
    #    it didn't run warm — each can only upgrade the record
    import jax
    if jax.default_backend() == "tpu":
        v = _run_probe("_pallas_probe", "PALLAS_MPIX",
                       int(os.environ.get("PALLAS_BENCH_TIMEOUT",
                                          "1500")))
        if v is not None:
            log(f"pallas geomorphons 2048x4096: {v:.0f} Mpix/s")
        emit_if_better(v, "pallas exact 2048x4096")
    if scale is None:
        scale = bench_scale()
        emit_if_better(scale, "8192² exact ladder")
    if emitted is None:
        log("FATAL: no probe produced a measurement; no record emitted")
    try:
        bench_fast_ladder()
    except Exception as e:
        log("fast-ladder bench failed:", e)
    try:
        bench_gridding()
    except Exception as e:
        log("gridding bench failed:", e)
    try:
        bench_smrf()
    except Exception as e:
        log("smrf bench failed:", e)
    try:
        bench_inpaint()
    except Exception as e:
        log("inpaint bench failed:", e)
    try:
        bench_stats()
    except Exception as e:
        log("stats bench failed:", e)
    try:
        bench_sharded_overhead()
    except Exception as e:
        log("sharded-overhead bench failed:", e)
    try:
        bench_mosaic()
    except Exception as e:
        log("mosaic bench failed:", e)
    try:
        bench_demo50k_recorded()
    except Exception as e:
        log("demo50k record read failed:", e)


if __name__ == "__main__":
    main()
