#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: Mray/s on one chip at the BASELINE north-star config —
Cornell_Box.json at 400x200, 16 spp, max_depth 32, Pallas megakernel.
A ray = one scene-traversal sweep (primary/bounce closest-hit or NEE shadow
any-hit), counted on device per lane (only for lanes whose reference thread
would traverse — masked/ballast work is *not* counted).

vs_baseline is value / 500 — the ratio to the BASELINE.json *target* of
>= 500 Mray/s/chip (the reference itself publishes no numbers, BASELINE.md);
it is a target ratio, not a measured-reference ratio.

Protocol: N chained frames x 3 reps, report the MEDIAN rep (BASELINE.md
quotes these medians). N is per-config (CONFIGS[...]["frames"]; 480 for
per-frame-dispatched configs, 960 for the chained small configs) — sized so
the ONE host sync that ends a timed rep (~25-30 ms tunnel RTT in this dev
setup) is <5% of the rep's device time. Round <=2 used a flat N=48, which
silently charged that sync to the device: the north star under-read ~13%
and the sub-ms configs up to 5x (measured, tools/perf_probe19.py). Round 4:
the chained (sub-ms) configs additionally size their timed reps by measured
WALL TIME (>= MIN_REP_S of device time per rep, calibrated by one untimed
rep) — a 960-frame rep was only ~150 ms on 80x40, leaving readings ±30%.
Rays are summed over the timed frames themselves (adaptive scenes draw
different budgets per frame, so the warm-up frame's count is not
representative).

Correctness gate: unless --no-check, a small config is rendered with both
backend=pallas and backend=jnp on the same seeds and compared (ray-count
equality + radiance tolerance) — the on-hardware kernel-vs-oracle check; the
verdict is embedded in the JSON line as "check".

Usage: python bench.py [--config north_star|cornell_shipped|demo|scene2|
                                 cornell_80x40|scan100]
                       [--backend pallas|jnp] [--frames N] [--reps N]
                       [--verbose] [--all] [--no-check] [--check-only]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

TARGET_MRAY_S = 500.0
# Minimum device wall time per timed rep for the chained (sub-ms) configs —
# sized so the one rep-ending host sync (~25-30 ms tunnel RTT) stays noise
# (VERDICT r3 #5: fixed 960-frame reps were ~150 ms on 80x40 and swung ±30%).
MIN_REP_S = 1.0

CONFIGS = {
    # "frames" = timed frames per rep (protocol v3): long enough that the
    # one rep-ending host sync is <5% of the rep. --frames overrides.
    # BASELINE.json configs
    "north_star": dict(scene="Cornell_Box", spp=16, depth=32,
                       frames=480),  # config 2
    # Sub-2ms-compute configs are dispatch-overhead-bound under per-frame
    # driving (one ~1-2 ms device dispatch per ~0.3 ms of compute) and the
    # timings swung ±30% between sessions. chain=8 measures them through
    # the chained headless path (8 frames per dispatch,
    # offline.make_chunk_renderer) — what `--frames` actually runs.
    "cornell_80x40": dict(  # config 1: tiny ASCII
        scene="Cornell_Box", width=80, height=40, spp=1, depth=4, chain=8,
        frames=960,
    ),
    "cornell_shipped": dict(scene="Cornell_Box",
                            frames=480),  # 400x200, 128 spp, depth 3
    "demo": dict(scene="demo", chain=8,
                 frames=960),  # adaptive many-sphere scene
    "scene2": dict(scene="scene2", chain=8, frames=960),
    # config 3: 100-frame temporal accumulation compiled as one lax.scan
    "scan100": dict(scene="Cornell_Box", spp=16, depth=32, scan=100),
    # many-primitive scenes: accel='auto' picks the array-resident
    # fori_loop sweep (ops/arrayscene.py) above ~96 primitives — fixed
    # code size, like the reference's storage-buffer loop
    "stress256": dict(scene="stress:256", frames=480),
    "stress1024": dict(scene="stress:1024", frames=192),
    # many-TRIANGLE mesh scene (models/mesh.py icosphere, 1280 faces +
    # light + floor): the triangle sweep at mesh scale, same array path
    "mesh1280": dict(scene="icosphere:3", frames=192),
    # dielectric extension at north-star params: the Cornell variant with
    # two glass spheres (Fresnel refract-or-reflect branch, one extra
    # gated draw) — measures the glass branch's cost against north_star
    "glass": dict(scene="cornell_glass", spp=16, depth=32, frames=480),
    # volumetric-fog extension at north-star params (fog = extinction
    # density; analytic distance sampling, +1 gated draw per bounce and
    # NEE transmittance exp) — measures the medium's cost vs north_star
    "fog": dict(scene="Cornell_Box", spp=16, depth=32, fog=0.15,
                frames=480),
    # image-texture extension at north-star params: the packaged textured
    # scene (two 64x64 atlas textures = 64 rows; per-lane texel gathers in
    # every scheduler iteration + the polynomial-atan2 spherical uv) —
    # measures the gather's cost against north_star
    "textured": dict(scene="textured", spp=16, depth=32, frames=480),
    # environment-map sky at north-star params: the packaged envmap scene
    # (globe texture sampled by ray direction on every miss; sky-lit only,
    # no NEE lights) — measures the miss-branch sky fetch
    "envmap": dict(scene="envmap", spp=16, depth=32, frames=480),
    # normal-map extension at north-star params: the packaged bumpy scene
    # (bricks color + derived normal map on floor/wall = TWO mapped
    # fetches + the tangent-frame math every iteration)
    "bumpy": dict(scene="bumpy", spp=16, depth=32, frames=480),
    # à-trous denoiser at north-star params (ops/denoise.py; 3 passes =
    # 75 shifted-plane taps fused into the step epilogue) — measures the
    # reconstruction filter's cost against north_star
    "denoised": dict(scene="Cornell_Box", spp=16, depth=32, denoise=1.0,
                     frames=480),
    # stratified pixel-jitter sampler at north-star params (ops/tracer.py
    # stratify_jitter: base samples on a jittered 2x2 sub-pixel grid —
    # two bit-ops + two selects per base ray gen) — the sampler should be
    # measured ~free against north_star
    "stratified": dict(scene="Cornell_Box", spp=16, depth=32,
                       sampler="stratified", frames=480),
    # many-LIGHT scene (lights:16 — 16 emissive spheres over a diffuse
    # field): the reference's NEE loop casts one shadow ray per light per
    # bounce, so per-bounce occlusion cost is O(L) primitive sweeps;
    # `light_sample: power` (the one-light NEE extension,
    # ops/tracer._one_light_nee) picks ONE light by emitted power and
    # casts a single weighted shadow ray — O(1). The A/B pair measures
    # that scaling win at L=16 (note Mray/s counts OWED rays, which the
    # one-light mode also cuts ~8.5x per bounce — compare ms/frame).
    "manylights": dict(scene="lights:16", frames=192),
    "manylights_one": dict(scene="lights:16", light_sample="power",
                           frames=480),
    # dynamic (animated) scenes: geometry streams through SMEM as runtime
    # values (ops/dynamic.py; --animate); north-star params, orbit animator
    "dynamic": dict(scene="Cornell_Box", spp=16, depth=32, dynamic=True,
                    frames=480),
    # animated AT SCALE: dynamic x array traversal (ops/arrayscene.py
    # ArrayDynPrims) — runtime values AND O(1) kernel code in N
    "dynamic1024": dict(scene="stress:1024", dynamic=True, frames=192),
}


def _load(cfg):
    from terminal_raytracer_tpu.models import Camera, load_scene

    scene = load_scene(cfg["scene"]).with_overrides(
        width=cfg.get("width"),
        height=cfg.get("height"),
        samples_per_pixel=cfg.get("spp"),
        max_depth=cfg.get("depth"),
        sampler=cfg.get("sampler"),
        light_sample=cfg.get("light_sample"),
    )
    if cfg.get("fog"):
        from terminal_raytracer_tpu.models.scene import Fog

        scene = scene.with_overrides(fog=Fog(density=float(cfg["fog"])))
    return scene, Camera()


def _frames_for(config_name: str, override) -> int:
    """Timed frames per rep: explicit --frames, else the config's protocol
    count (CONFIGS[...]["frames"]), else 48."""
    if override is not None:
        return int(override)
    return int(CONFIGS[config_name].get("frames", 48))


def run_bench(config_name: str, backend: str, frames, reps: int,
              verbose: bool):
    """Returns (median Mray/s, median fps, mean occupancy or None) over
    `reps` timed repetitions. `frames=None` uses the config's protocol
    frame count."""
    import jax

    from terminal_raytracer_tpu.runtime import init_state, make_render_step

    cfg = CONFIGS[config_name]
    frames = _frames_for(config_name, frames)
    scene, cam = _load(cfg)
    pose = cam.pose()

    if cfg.get("scan"):
        return _run_bench_scan(scene, pose, cfg["scan"], backend, reps,
                               verbose, config_name)
    if cfg.get("chain"):
        return _run_bench_chain(scene, pose, int(cfg["chain"]), backend,
                                frames, reps, verbose, config_name)

    dynamic = bool(cfg.get("dynamic"))
    if dynamic:
        # The shipped --animate path: sorted two-kernel pipeline under
        # runtime values, with the animator's static key subset folded
        # back to baked constants (runtime/engine.py does the same).
        from terminal_raytracer_tpu.models.animate import ANIMATOR_KEYS

        animated = ANIMATOR_KEYS["orbit"]
    else:
        animated = None
    step = make_render_step(scene, full_color=True, backend=backend,
                            dynamic=dynamic, animated=animated,
                            denoise=float(cfg.get("denoise", 0.0)))
    if dynamic:
        from terminal_raytracer_tpu.models.animate import orbit
        from terminal_raytracer_tpu.ops.dynamic import pack_scene

        arrays0 = pack_scene(scene)
        raw_step = step
        anim_t = [0]

        def step(state, pose, seed, frame):
            arrays = orbit(arrays0, anim_t[0])
            anim_t[0] += 1
            # animated frames render fresh (no temporal accumulation)
            return raw_step(state, pose, seed, np.int32(0), arrays)

    state = init_state(scene)

    # Warm-up / compile (also forces the first, slow, tunnel transfer).
    out = step(state, pose, np.uint32(1), np.int32(0))
    jax.device_get(out.rays)
    state = out.state

    mrays, fpss = [], []
    frame = 1
    for _ in range(reps):
        # Submit `frames` chained steps (state donation keeps accumulation
        # on-device, like the interactive loop); keep each frame's on-device
        # ray count and sync once at the end. Rays are summed over exactly
        # the timed frames (adaptive budgets differ per frame/seed).
        ray_counts, occ_counts = [], []
        t0 = time.perf_counter()
        for _ in range(frames):
            out = step(state, pose, np.uint32(1 + frame), np.int32(frame))
            state = out.state
            ray_counts.append(out.rays)
            occ_counts.append(out.occupancy)
            frame += 1
        total_rays = float(sum(jax.device_get(ray_counts)))
        dt = (time.perf_counter() - t0) / frames
        mrays.append(total_rays / frames / dt / 1e6)
        fpss.append(1.0 / dt)

    # Measured lane occupancy over the final rep's frames (the sorted
    # pipeline surfaces it; other schedulers report -1 -> omit).
    occ_vals = [float(o) for o in jax.device_get(occ_counts)]
    occ = (sum(occ_vals) / len(occ_vals)
           if occ_vals and min(occ_vals) >= 0.0 else None)

    mray_s = statistics.median(mrays)
    fps = statistics.median(fpss)
    if verbose:
        px = scene.width * scene.height
        rpf = total_rays / frames
        occ_txt = f" | occ {occ * 100.0:.1f}%" if occ is not None else ""
        print(
            f"[bench] {config_name} backend={backend} "
            f"{scene.width}x{scene.height} spp={scene.samples_per_pixel} "
            f"depth={scene.max_depth} | protocol {frames}f x {reps} reps | "
            f"median {1e3 / fps:.2f} ms/frame = {fps:.1f} fps | "
            f"{rpf:.3e} rays/frame -> {mray_s:.1f} Mray/s "
            f"(reps: {', '.join(f'{m:.0f}' for m in mrays)}) | "
            f"{rpf / px:.1f} rays/px{occ_txt}",
            file=sys.stderr,
        )
    return mray_s, fps, occ


def _run_bench_chain(scene, pose, chain, backend, frames, reps, verbose,
                     config_name):
    """Overhead-bound configs: the chained headless path — `chain` frames
    folded into one dispatch (runtime/offline.make_chunk_renderer, what
    Engine.run_headless runs). Protocol is unchanged (`frames` timed frames
    per rep), just fewer dispatches."""
    import jax

    from terminal_raytracer_tpu.runtime import init_state
    from terminal_raytracer_tpu.runtime.offline import make_chunk_renderer

    render = make_chunk_renderer(scene, chain, full_color=True,
                                 backend=backend)
    n_chunks = max(frames // chain, 1)

    def seeds_for(frame):
        return (np.uint32(1) + np.arange(frame, frame + chain,
                                         dtype=np.uint64)).astype(np.uint32)

    state = init_state(scene)
    out, _rays = render(state, pose, seeds_for(0), np.int32(0))
    jax.device_get(out.rays)  # compile + first tunnel transfer
    state = out.state

    # Wall-time-sized reps (round-4 protocol): the chained configs are the
    # sub-ms rows, and a FIXED frame count leaves a rep only ~150 ms on the
    # fastest (80x40) — the ~25-30 ms rep-ending sync then swings readings
    # ±30% between sessions. Calibrate with one untimed rep at the
    # config's protocol count and scale the timed reps to >= MIN_REP_S of
    # device wall time (ceil'd to whole chunks, capped at 16x to bound the
    # bench budget).
    frame = chain
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out, rays_k = render(state, pose, seeds_for(frame), np.int32(frame))
        state = out.state
        frame += chain
    jax.device_get(out.rays)
    calib_dt = time.perf_counter() - t0
    scale = min(max(1, int(np.ceil(MIN_REP_S / max(calib_dt, 1e-3)))), 16)
    n_chunks *= scale

    mrays, fpss = [], []
    for _ in range(reps):
        ray_vecs = []
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            out, rays_k = render(state, pose, seeds_for(frame),
                                 np.int32(frame))
            state = out.state
            ray_vecs.append(rays_k)
            frame += chain
        total_rays = float(sum(float(np.sum(r))
                               for r in jax.device_get(ray_vecs)))
        dt = (time.perf_counter() - t0) / (n_chunks * chain)
        mrays.append(total_rays / (n_chunks * chain) / dt / 1e6)
        fpss.append(1.0 / dt)

    mray_s = statistics.median(mrays)
    fps = statistics.median(fpss)
    if verbose:
        px = scene.width * scene.height
        rpf = total_rays / (n_chunks * chain)
        print(
            f"[bench] {config_name} backend={backend} "
            f"{scene.width}x{scene.height} spp={scene.samples_per_pixel} "
            f"depth={scene.max_depth} | chained x{chain}: "
            f"{n_chunks * chain}f x {reps} reps | "
            f"median {1e3 / fps:.2f} ms/frame = {fps:.1f} fps | "
            f"{rpf:.3e} rays/frame -> {mray_s:.1f} Mray/s "
            f"(reps: {', '.join(f'{m:.0f}' for m in mrays)}) | "
            f"{rpf / px:.1f} rays/px",
            file=sys.stderr,
        )
    return mray_s, fps, None


def _run_bench_scan(scene, pose, n_frames, backend, reps, verbose,
                    config_name):
    """BASELINE config 3: the whole accumulation compiled as one lax.scan."""
    import jax

    from terminal_raytracer_tpu.runtime import init_state
    from terminal_raytracer_tpu.runtime.offline import make_scan_renderer

    render = make_scan_renderer(scene, n_frames, full_color=True,
                                backend=backend)
    rng = np.random.RandomState(0)

    def seeds():
        return (
            rng.randint(0, 2**32, size=n_frames, dtype=np.uint64)
            + np.arange(n_frames, dtype=np.uint64)
        ).astype(np.uint32)

    # Warm-up / compile.
    state, rgb, glyphs, rays = render(init_state(scene), pose, seeds())
    jax.device_get(rays)

    mrays, fpss = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, rgb, glyphs, rays = render(init_state(scene), pose, seeds())
        total_rays = float(jax.device_get(rays))
        dt = time.perf_counter() - t0
        mrays.append(total_rays / dt / 1e6)
        fpss.append(n_frames / dt)

    mray_s = statistics.median(mrays)
    fps = statistics.median(fpss)
    if verbose:
        print(
            f"[bench] {config_name} backend={backend} "
            f"{scene.width}x{scene.height} spp={scene.samples_per_pixel} "
            f"depth={scene.max_depth} | {n_frames}-frame scan x {reps} reps | "
            f"median {fps:.1f} fps | {mray_s:.1f} Mray/s "
            f"(reps: {', '.join(f'{m:.0f}' for m in mrays)})",
            file=sys.stderr,
        )
    return mray_s, fps, None


def run_check(verbose: bool) -> str:
    """On-hardware kernel-vs-oracle gate: render a small config with
    backend=pallas and backend=jnp on the same seeds; assert exact ray-count
    equality and radiance tolerance. Returns a 'pass(...)' / 'FAIL(...)'
    string (kernel semantics: reference shader.wgsl:439-622)."""
    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.runtime import init_state, make_render_step

    scene = load_scene("Cornell_Box").with_overrides(
        width=128, height=16, samples_per_pixel=16, max_depth=8
    )
    cam = Camera()
    outs = {}
    for backend in ("pallas", "jnp"):
        step = make_render_step(scene, full_color=True, backend=backend)
        state = init_state(scene)
        for f in range(3):
            out = step(state, cam.pose(), np.uint32(42 + f), np.int32(f))
            state = out.state
        outs[backend] = jax.device_get(
            (out.rays, out.state.acc, out.state.samples)
        )
    rays_p, acc_p, samp_p = outs["pallas"]
    rays_j, acc_j, samp_j = outs["jnp"]
    ray_eq = float(rays_p) == float(rays_j)
    samp_eq = bool(np.array_equal(samp_p, samp_j))
    max_abs = float(np.max(np.abs(acc_p - acc_j)))
    denom = np.maximum(np.abs(acc_j), 1e-3)
    max_rel = float(np.max(np.abs(acc_p - acc_j) / denom))
    ok = ray_eq and samp_eq and max_rel < 5e-3
    verdict = (
        f"{'pass' if ok else 'FAIL'}(rays {'==' if ray_eq else '!='}, "
        f"budgets {'==' if samp_eq else '!='}, "
        f"maxabs={max_abs:.2e}, maxrel={max_rel:.2e})"
    )
    if verbose or not ok:
        print(f"[check] pallas-vs-jnp on {jax.default_backend()}: {verdict}",
              file=sys.stderr)
    return verdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="north_star", choices=sorted(CONFIGS))
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "jnp"])
    ap.add_argument("--frames", type=int, default=None,
                    help="timed frames per rep (default: the config's "
                         "protocol count)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="run every config (verbose table)")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the pallas-vs-jnp correctness gate")
    ap.add_argument("--check-only", action="store_true",
                    help="run only the correctness gate, then exit")
    args = ap.parse_args()

    import os

    import jax

    # Persistent compilation cache (same dir as the CLI): repeat bench
    # sessions skip the tens-of-seconds kernel compiles.
    cache_dir = os.environ.get(
        "TERMINAL_RAYTRACER_CACHE",
        os.path.expanduser("~/.cache/terminal_raytracer_tpu/xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except (OSError, AttributeError):
        pass

    on_tpu = jax.default_backend().startswith("tpu")

    if args.check_only:
        verdict = run_check(verbose=True)
        print(json.dumps({"metric": "pallas-vs-jnp check", "value": 1.0 if
                          verdict.startswith("pass") else 0.0, "unit": "bool",
                          "vs_baseline": 1.0, "check": verdict}))
        return 0 if verdict.startswith("pass") else 1

    if args.all:
        for name in CONFIGS:
            if name == args.config:
                continue
            run_bench(name, args.backend, args.frames, args.reps,
                      verbose=True)

    mray_s, fps, occ = run_bench(args.config, args.backend, args.frames,
                                 args.reps, args.verbose)

    record = {
        "metric": "Mray/s/chip @ Cornell 400x200 16spp depth32"
        if args.config == "north_star"
        else f"Mray/s/chip @ {args.config}",
        "value": round(mray_s, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mray_s / TARGET_MRAY_S, 4),
        "fps": round(fps, 2),
        "protocol": f"median of {args.reps} reps x "
                    f"{_frames_for(args.config, args.frames)} frames"
                    + (" (wall-time-sized to >= 1 s reps)"
                       if CONFIGS[args.config].get("chain") else ""),
        "vs_baseline_is": "ratio to the 500 Mray/s target (no published "
                          "reference numbers)",
    }
    if occ is not None:
        # Measured sweep-weighted lane occupancy of the sorted pipeline
        # (owed sweeps / executed lane-iteration sweeps), final rep mean.
        record["occupancy"] = round(occ, 4)
    # The on-hardware correctness gate rides along in the same record so the
    # driver's BENCH_r{N}.json carries the kernel-vs-oracle verdict.
    if not args.no_check and on_tpu:
        record["check"] = run_check(args.verbose)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
