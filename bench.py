"""Benchmark: latent-sample → 512³ mesh wall-clock on one TPU chip.

The north-star metric (BASELINE.json): ≤5 s from sampling a latent with the
full 1000-step DDPM loop (224-ch MDM denoiser) to a cleaned 512³ mesh.

Because no trained Surf-D checkpoint exists in this environment, the decoder
is overfitted on-the-fly to an analytic sphere UDF (radius 0.6 — a
representative garment-scale closed surface); fitting time is NOT part of the
metric. The timed pipeline is exactly the production path:
  1. 1000-step DDPM latent sample through the full-size MDM (jitted scan)
  2. block-sparse 512³ UDF grid fill through the real CbnDecoder (512 hidden,
     5 CBN blocks, latent 32) + near-band gradient pass
  3. marching-tetrahedra UDF extraction + face filter + cleanup (host)

Robustness (the r2 driver run timed out with no output — the tunnel to the
TPU intermittently stalls d2h for ~5 min): the whole run operates under a
hard time budget (SURFD_BENCH_BUDGET seconds, default 1500).  Every heavy
phase executes on a worker thread joined against the deadline; a heartbeat
line is printed every 30 s; the FIRST completed extraction already yields a
reportable number, later runs only improve it; and at the deadline (or on
SIGTERM/SIGINT) the best result so far is printed and the process exits 0.
The warm-up run uses the exact timed config, so it compiles nothing the
timed path doesn't use.

Prints ONE JSON line on stdout:
  {"metric": "latent_to_512_mesh_seconds", "value": ..., "unit": "s",
   "vs_baseline": ...}
vs_baseline = north_star(5 s) / value  (>1 means faster than the target).
"""

import argparse
import json
import os
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the 1000-step sampler and the decoder executables
# take minutes to compile through the remote-compile tunnel; cache survives
# across bench runs in the same container.
jax.config.update("jax_compilation_cache_dir", "/tmp/surfd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T_START = time.perf_counter()
DEADLINE = T_START + float(os.environ.get("SURFD_BENCH_BUDGET", "1500"))
_PHASE = ["startup"]
_RESULT = {}  # best result so far; printed exactly once at exit
_EMITTED = threading.Event()


def log(*a):
    print(f"[{time.perf_counter()-T_START:7.1f}s]", *a, file=sys.stderr, flush=True)


def emit_and_exit(code=0):
    """Print the best result so far (exactly once) and hard-exit."""
    if not _EMITTED.is_set():
        _EMITTED.set()
        if _RESULT:
            print(json.dumps(_RESULT), flush=True)
        else:
            log("no completed extraction before deadline; nothing to report")
            code = max(code, 1)
    os._exit(code)


def _heartbeat():
    while not _EMITTED.is_set():
        time.sleep(30)
        rem = DEADLINE - time.perf_counter()
        log(f"[hb] phase={_PHASE[0]} budget_left={rem:.0f}s")


def run_phase(name, fn, *args, timeout=None):
    """Run fn on a worker thread, joined against the global deadline.

    A wedged device round trip (tunnel stall) cannot be interrupted, but the
    main thread stays responsive: at the deadline it reports whatever has
    completed and exits 0 instead of being killed output-less (r2 rc=124).
    `timeout` bounds one phase tighter than the budget — used for device
    acquisition, which hangs indefinitely when the tunnel relay is down.
    """
    _PHASE[0] = name
    box = {}

    def work():
        try:
            box["out"] = fn(*args)
        except BaseException as e:  # noqa: BLE001 — report, then die cleanly
            box["err"] = e

    th = threading.Thread(target=work, daemon=True, name=name)
    t0 = time.perf_counter()
    th.start()
    limit = DEADLINE - time.perf_counter()
    if timeout is not None:
        limit = min(limit, timeout)
    th.join(max(1.0, limit))
    if th.is_alive():
        log(f"phase '{name}' still running at deadline — reporting best-so-far")
        emit_and_exit(0)
    if "err" in box:
        log(f"phase '{name}' FAILED: {box['err']!r}")
        emit_and_exit(0)  # report best-so-far if any; rc 1 only if none
    log(f"phase '{name}' done in {time.perf_counter()-t0:.1f}s")
    return box.get("out")


def fit_decoder_to_sphere(decoder, ce, latent, steps=1500, seed=0):
    """Overfit the CBN decoder to UDF(sphere r=0.6) conditioned on `latent`."""
    import optax

    rngn = np.random.default_rng(seed)
    dv = decoder.init(jax.random.PRNGKey(0), ce.encode(jnp.zeros((1, 64, 3))), latent)
    params, stats = dv["params"], dv["batch_stats"]
    tx = optax.adam(optax.cosine_decay_schedule(2e-3, steps, alpha=0.02))
    opt = tx.init(params)

    @jax.jit
    def fit_step(params, stats, opt, q, target):
        def loss_fn(p, s):
            logits, upd = decoder.apply(
                {"params": p, "batch_stats": s}, ce.encode(q), latent,
                train=True, mutable=["batch_stats"],
            )
            return optax.sigmoid_binary_cross_entropy(logits, target).mean(), upd

        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), upd["batch_stats"], opt, l

    B = 8192
    for i in range(steps):
        # importance-sample near the surface so the BCE sees both classes
        q_near = rngn.normal(size=(B // 2, 3))
        q_near = q_near / np.linalg.norm(q_near, axis=-1, keepdims=True)
        q_near = q_near * (0.6 + rngn.normal(size=(B // 2, 1)) * 0.08)
        q_far = rngn.uniform(-1, 1, (B // 2, 3))
        q = np.clip(np.concatenate([q_near, q_far]), -1, 1)[None].astype(np.float32)
        r = np.linalg.norm(q, axis=-1)
        udf = np.minimum(np.abs(r - 0.6), 0.1)
        target = jnp.asarray(1 - udf / 0.1, jnp.float32)
        params, stats, opt, l = fit_step(params, stats, opt, jnp.asarray(q), target)
        if i % 250 == 0:
            log(f"  fit step {i}/{steps}")
    log(f"decoder fitted: final BCE {float(l):.4f}")
    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--fit-steps", type=int, default=2500)
    ap.add_argument("--latent-size", type=int, default=32)
    ap.add_argument("--max-runs", type=int, default=8,
                    help="max extraction runs (first doubles as warm-up); the "
                         "budget check stops early when time runs short")
    args = ap.parse_args()

    threading.Thread(target=_heartbeat, daemon=True).start()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: emit_and_exit(0))

    from surfd_tpu.diffusion import named_schedule, p_sample_loop
    from surfd_tpu.models import MDM, CbnDecoder, CoordsEncoder
    from surfd_tpu.pipelines import MeshExtractionConfig, get_mesh_from_udf, make_udf_fn

    # Device acquisition hangs forever (not just ~5 min) when the tunnel
    # relay process is gone — bound it so the driver gets a clean failure
    # line instead of an output-less rc=124.
    dev = run_phase("device_init", lambda: jax.devices()[0], timeout=600)
    log(f"device: {dev}")

    # --- flagship denoiser + jitted 1000-step DDPM sampler ---
    mdm = MDM(cond_mode="no_cond")
    L = args.latent_size
    params = run_phase(
        "init_denoiser",
        lambda: mdm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, L, 1)), jnp.zeros((1,), jnp.int32)
        ),
    )
    sched = named_schedule("cosine", 1000)

    @jax.jit
    def sample_latent(params, rng):
        fn = lambda x, t: mdm.apply(params, x, t)
        return p_sample_loop(sched, fn, (1, L, 1), rng)

    # compile (hits /tmp/surfd_jax_cache on repeat runs)
    run_phase("compile_sampler",
              lambda: np.asarray(sample_latent(params, jax.random.PRNGKey(1))))
    log("DDPM sampler compiled")

    # --- decoder fitted to the sphere UDF ---
    # The fit is EXCLUDED from the metric; cache the fitted params on disk so
    # repeat runs skip the 2500 sequential tunnel round trips (under co-tenant
    # load the fit alone can take >15 min).
    hidden, layers = 512, 5
    decoder = CbnDecoder(latent_dim=L, hidden_dim=hidden, num_hidden_layers=layers)
    ce = CoordsEncoder()
    latent = jnp.full((1, L), 0.1, jnp.float32)
    # key carries every setting the fit depends on — a stale cache after an
    # architecture edit would silently benchmark the wrong decoder
    cache_path = f"/tmp/surfd_bench_decoder_L{L}_h{hidden}x{layers}_s{args.fit_steps}.npz"
    import flax

    if os.path.exists(cache_path):
        def _load():
            with open(cache_path, "rb") as fh:
                restored = flax.serialization.msgpack_restore(fh.read())
            return jax.tree.map(jnp.asarray, restored)  # ~12 MB h2d upload

        dvars = run_phase("load_decoder_cache", _load)
        log(f"decoder loaded from {cache_path} (fit skipped)")
    else:
        dvars = run_phase(
            "fit_decoder",
            lambda: fit_decoder_to_sphere(decoder, ce, latent, steps=args.fit_steps),
        )
        host_vars = jax.tree.map(np.asarray, dvars)
        with open(cache_path, "wb") as fh:
            fh.write(flax.serialization.msgpack_serialize(host_vars))

    udf_fn = make_udf_fn(decoder, dvars, latent[0])
    cfg = MeshExtractionConfig(resolution=args.resolution, min_component_faces=0)

    # --- timed sampling (compile already done above; axon block_until_ready
    # is a no-op, so force completion by fetching the tiny latent) ---
    def timed_sample():
        t0 = time.perf_counter()
        lat = np.asarray(sample_latent(params, jax.random.PRNGKey(42)))
        return time.perf_counter() - t0, lat

    t_sample, _ = run_phase("sample_latent", timed_sample)
    log(f"latent sample: {t_sample:.2f}s")

    # --- extraction runs: the FIRST run doubles as warm-up (same cfg → same
    # executables as every later run) and already produces a reportable
    # number; later runs, budget permitting, only improve it.  The shared
    # tunnel/VM adds ±50% run-to-run noise; min is the machine capability. ---
    runs = []
    rss_mb = []

    def _rss_now_mb():
        # current resident set (not the ru_maxrss high-water mark): run-over-
        # run growth here localizes residual first-touch / arena-miss cost
        # (VERDICT r4 next #6 asked for per-run RSS in the bench stats)
        try:
            with open("/proc/self/statm") as fh:
                return int(fh.read().split()[1]) * os.sysconf("SC_PAGESIZE") // (1 << 20)
        except OSError:
            return -1

    def one_extraction():
        t1 = time.perf_counter()
        mesh, stats_i = get_mesh_from_udf(udf_fn, cfg=cfg, return_stats=True)
        return time.perf_counter() - t1, mesh, stats_i

    for i in range(args.max_runs):
        est = runs[0] * 1.3 if runs else 0.0
        if runs and time.perf_counter() + est > DEADLINE:
            log(f"budget exhausted after {len(runs)} run(s)")
            break
        dt, mesh, stats = run_phase(f"extraction_{i}", one_extraction)
        runs.append(dt)
        rss_mb.append(_rss_now_mb())
        log(f"extraction run {i}{' (warm-up)' if i == 0 else ''}: "
            f"{dt:.2f}s  rss {rss_mb[-1]} MB  {stats['times']}")
        # best-of-completed: exclude the warm-up run once a clean run exists
        timed = runs[1:] if len(runs) > 1 else runs
        best = min(timed)
        total = t_sample + best
        _RESULT.update(
            metric="latent_to_512_mesh_seconds",
            value=round(total, 3),
            unit="s",
            vs_baseline=round(5.0 / total, 3),
            median_s=round(t_sample + float(np.median(timed)), 3),
            runs=[round(r, 2) for r in runs],
            rss_mb=list(rss_mb),
        )
        log(f"result so far: {_RESULT['value']}s (vs_baseline {_RESULT['vs_baseline']})")
        if i == 0:
            # report the warm-up mesh's stats once — they are run-invariant
            log(
                f"verts {len(mesh.vertices)} faces {len(mesh.faces)} | "
                f"active blocks {stats['active_blocks']}/{stats['total_blocks']} "
                f"fine pts {stats['fine_points']/1e6:.1f}M / "
                f"dense {stats['dense_points']/1e6:.0f}M"
            )
            # sanity: the mesh must be a plausible sphere shell
            if len(mesh.faces) > 1000:
                r = np.linalg.norm(mesh.vertices, axis=1)
                log(f"sphere check: median r {np.median(r):.3f} (target 0.6)")

    # --- open-surface fixture (VERDICT r3 next #4): the TRAINED synthetic-AE
    # decoder on a held-out open sheet — the garment-like workload class the
    # reference exists for — at the same resolution. Shipped self-contained in
    # the wheel (scripts/export_bench_fixture.py), so this runs in any fresh
    # checkout. Secondary metric: does not touch value/vs_baseline.
    fx_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "surfd_tpu", "assets", "bench_sheet_decoder.npz",
    )
    if os.path.exists(fx_path) and time.perf_counter() + 2 * max(runs) < DEADLINE:
        def load_fixture():
            z = np.load(fx_path)
            hid, lay = int(z["hidden_dim"]), int(z["num_hidden_layers"])
            dec = CbnDecoder(latent_dim=len(z["latent"]), hidden_dim=hid,
                             num_hidden_layers=lay)
            tmpl = dec.init(
                jax.random.PRNGKey(0), ce.encode(jnp.zeros((1, 8, 3))),
                jnp.zeros((1, len(z["latent"]))),
            )
            import jax.tree_util as jtu

            flat, treedef = jtu.tree_flatten_with_path(tmpl)
            leaves = []
            for kp, leaf in flat:
                key = "dec/" + "/".join(
                    str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
                )
                leaves.append(jnp.asarray(z[key].astype(np.asarray(leaf).dtype)))
            dv = jtu.tree_unflatten(treedef, leaves)
            return (dec, dv, jnp.asarray(z["latent"]), float(z["max_dist"]),
                    z["surface_samples"].astype(np.float32), str(z["item"]))

        dec_s, dv_s, lat_s, md_s, gt_s, item_s = run_phase("load_sheet_fixture", load_fixture)
        log(f"sheet fixture: trained decoder on {item_s} (max_dist {md_s})")
        udf_s = make_udf_fn(dec_s, dv_s, lat_s, max_dist=md_s)
        # surface_bias="auto" is the production setting for trained decoders
        # (the generate CLIs default to it): this decoder's UDF floor sits
        # above the 1/512 face threshold, so the raw reference semantics the
        # sphere phase measures would extract almost nothing here. Recorded
        # explicitly so the sheet numbers aren't mistaken for raw-pipeline ones.
        cfg_sheet = MeshExtractionConfig(
            resolution=args.resolution, min_component_faces=0, surface_bias="auto"
        )
        sheet_runs = []
        for i in range(3):
            if sheet_runs and time.perf_counter() + sheet_runs[0] * 1.3 > DEADLINE:
                break
            def one_sheet():
                t1 = time.perf_counter()
                m, st = get_mesh_from_udf(udf_s, cfg=cfg_sheet, return_stats=True)
                return time.perf_counter() - t1, m, st

            dt, mesh_s, stats_s = run_phase(f"sheet_extraction_{i}", one_sheet)
            sheet_runs.append(dt)
            log(f"sheet run {i}{' (warm-up)' if i == 0 else ''}: {dt:.2f}s  "
                f"{stats_s['times']}")
            timed = sheet_runs[1:] if len(sheet_runs) > 1 else sheet_runs
            _RESULT.update(
                sheet_512_s=round(t_sample + min(timed), 3),
                sheet_runs=[round(r, 2) for r in sheet_runs],
            )
            if i == 0:
                from surfd_tpu.geometry.metrics import chamfer_distance

                _RESULT.update(
                    sheet_surface_bias=round(float(stats_s.get("surface_bias", 0.0)), 6)
                )
                if len(mesh_s.faces) > 500:
                    sub = mesh_s.vertices[
                        np.random.default_rng(0).choice(
                            len(mesh_s.vertices), min(20000, len(mesh_s.vertices)),
                            replace=False)
                    ]
                    cd = chamfer_distance(sub, gt_s)
                    _RESULT.update(sheet_chamfer=round(float(cd), 6))
                    log(f"sheet mesh: {len(mesh_s.vertices)} verts "
                        f"{len(mesh_s.faces)} faces, Chamfer vs GT {cd:.3g}")
                else:
                    log(f"sheet mesh DEGENERATE: {len(mesh_s.faces)} faces")

    emit_and_exit(0)


if __name__ == "__main__":
    main()
