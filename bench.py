#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: Mray/s on one chip at the BASELINE north-star config —
Cornell_Box.json at 400x200, 16 spp, max_depth 32, Pallas megakernel.
A ray = one scene-traversal sweep (primary/bounce closest-hit or NEE shadow
any-hit), counted on device per lane (only for lanes whose reference thread
would traverse — masked/ballast work is *not* counted).

vs_baseline is value / 500 (the BASELINE.json target of >= 500 Mray/s/chip;
the reference itself publishes no numbers — BASELINE.md).

Extra diagnostics (fps, per-config table) go to stderr with --verbose; the
single stdout line stays machine-readable.

Usage: python bench.py [--config north_star|cornell_shipped|demo|scene2]
                       [--backend pallas|jnp] [--frames N] [--verbose]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

TARGET_MRAY_S = 500.0

CONFIGS = {
    # BASELINE.json configs
    "north_star": dict(scene="Cornell_Box", spp=16, depth=32),  # config 2
    "cornell_80x40": dict(scene="Cornell_Box", width=80, height=40, spp=1, depth=4),
    "cornell_shipped": dict(scene="Cornell_Box"),  # 400x200, 128 spp, depth 3
    "demo": dict(scene="demo"),  # adaptive-sampling many-sphere scene
    "scene2": dict(scene="scene2"),
}


def build(cfg, backend):
    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.runtime import init_state, make_render_step

    scene = load_scene(cfg["scene"]).with_overrides(
        width=cfg.get("width"),
        height=cfg.get("height"),
        samples_per_pixel=cfg.get("spp"),
        max_depth=cfg.get("depth"),
    )
    step = make_render_step(scene, full_color=True, backend=backend)
    return scene, step, init_state(scene), Camera()


def run_bench(config_name: str, backend: str, frames: int, verbose: bool):
    import jax

    cfg = CONFIGS[config_name]
    scene, step, state, cam = build(cfg, backend)
    pose = cam.pose()

    # Warm-up / compile (also forces the first, slow, tunnel transfer).
    out = step(state, pose, np.uint32(1), np.int32(0))
    rays_per_frame = float(jax.device_get(out.rays))
    state = out.state

    # Throughput protocol: submit `frames` chained steps (state donation
    # keeps accumulation on-device, like the interactive loop), force
    # completion once at the end via a host transfer.
    t0 = time.perf_counter()
    for f in range(1, frames + 1):
        out = step(state, pose, np.uint32(1 + f), np.int32(f))
        state = out.state
    jax.device_get(out.rays)
    dt = (time.perf_counter() - t0) / frames

    mray_s = rays_per_frame / dt / 1e6
    fps = 1.0 / dt
    if verbose:
        px = scene.width * scene.height
        print(
            f"[bench] {config_name} backend={backend} {scene.width}x{scene.height} "
            f"spp={scene.samples_per_pixel} depth={scene.max_depth} | "
            f"{dt * 1e3:.2f} ms/frame = {fps:.1f} fps | "
            f"{rays_per_frame:.3e} rays/frame -> {mray_s:.1f} Mray/s | "
            f"{rays_per_frame / px:.1f} rays/px",
            file=sys.stderr,
        )
    return mray_s, fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="north_star", choices=sorted(CONFIGS))
    ap.add_argument("--backend", default="auto", choices=["auto", "pallas", "jnp"])
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--all", action="store_true", help="run every config (verbose table)")
    args = ap.parse_args()

    if args.all:
        for name in CONFIGS:
            run_bench(name, args.backend, args.frames, verbose=True)

    mray_s, fps = run_bench(args.config, args.backend, args.frames, args.verbose)
    print(
        json.dumps(
            {
                "metric": "Mray/s/chip @ Cornell 400x200 16spp depth32"
                if args.config == "north_star"
                else f"Mray/s/chip @ {args.config}",
                "value": round(mray_s, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mray_s / TARGET_MRAY_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
