"""Round-5 probe: re-pin the INTERACTIVE north star at HEAD (VERDICT r4 #6).

Measures the interactive loop's real work — Engine.render_one dispatch,
the pipelined fetch-previous device sync, and the ANSI blit encode — in
exactly run_interactive's ordering (engine.py:255-297, the loop that must
beat the reference's synchronous lib.rs:386-565), with a scripted camera
move every MOVE_EVERY displayed frames (a fly-through: each move resets
accumulation to frame 0, the worst case — no converged idle frames).
The terminal write itself is excluded (measured separately: the C++
blitter encode IS the CPU cost; the pty write is ~0.5 ms at 200x100 and
drowns in the tunnel RTT anyway — and tools/perf_probe25.py showed a
full-size pty fly-through over the dev tunnel measures the pty, not the
engine).

Variants: default pipelined engine, --no-pipeline ordering (the
reference's synchronous structure), denoise=1, tonemap=aces.

    python tools/perf_probe25b.py [--seconds 20]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MOVE_EVERY = 3  # displayed frames per scripted key (a brisk fly-through)


def run_variant(label, seconds, pipeline=True, denoise=0.0,
                tonemap="reference", backend="pallas", overrides=None):
    import jax

    from terminal_raytracer_tpu.runtime.engine import Engine
    from terminal_raytracer_tpu.models import load_scene

    scene = load_scene("demo")
    if overrides:
        scene = scene.with_overrides(**overrides)
    eng = Engine(scene, backend=backend, pipeline=pipeline,
                 denoise=denoise, tonemap=tonemap)
    keys = "adad"

    # run_interactive's loop, terminal replaced by the blit encode only.
    pending = None
    cam_moved = True
    frames = []  # (t_disp, tpu_s, cpu_s) per displayed frame
    ki = 0
    next_move_at = MOVE_EVERY
    warm_frames = 30  # first fetch pays tunnel+compile; FPS window warms
    t_end = None
    while t_end is None or time.time() < t_end:
        if t_end is None and len(frames) >= warm_frames:
            t_end = time.time() + seconds
            frames.clear()
            next_move_at = MOVE_EVERY
        moved = False
        if len(frames) >= next_move_at:
            moved = eng.camera.apply_key(keys[ki % len(keys)])
            ki += 1
            next_move_at = len(frames) + MOVE_EVERY
        if moved:
            cam_moved = True
            eng.frame_count = 0
            pending = None
        out = eng.render_one(0 if cam_moved else eng.frame_count)
        cam_moved = False
        if not pipeline:
            t0 = time.perf_counter()
            fetched = eng._fetch(out)
            t1 = time.perf_counter()
            payload = eng.blitter.encode(
                np.asarray(fetched[0]),
                None if fetched[1] is None else np.asarray(fetched[1]))
            t2 = time.perf_counter()
            frames.append((t2, t1 - t0, t2 - t1))
            continue
        if pending is not None:
            t0 = time.perf_counter()
            fetched = eng._fetch(pending)
            t1 = time.perf_counter()
            payload = eng.blitter.encode(
                np.asarray(fetched[0]),
                None if fetched[1] is None else np.asarray(fetched[1]))
            t2 = time.perf_counter()
            frames.append((t2, t1 - t0, t2 - t1))
        pending = out

    if len(frames) < 10:
        print(f"  {label}: only {len(frames)} frames", flush=True)
        return
    dts = [b[0] - a[0] for a, b in zip(frames, frames[1:])]
    fps = 1.0 / statistics.median(dts)
    tpu = statistics.median(f[1] for f in frames) * 1e3
    cpu = statistics.median(f[2] for f in frames) * 1e3
    print(f"  {label:12s}: {fps:6.1f} fps | fetch {tpu:5.1f} ms"
          f" | blit {cpu:4.2f} ms | {len(frames)} frames in"
          f" {frames[-1][0] - frames[0][0]:.1f} s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny jnp-backend run to validate the loop flow")
    args = ap.parse_args()
    ov, backend = None, "pallas"
    if args.cpu_smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
        ov = dict(width=40, height=12, samples_per_pixel=2, max_depth=2)
        backend = "jnp"
    for label, kw in (
        ("default", {}),
        ("no-pipeline", dict(pipeline=False)),
        ("denoise1", dict(denoise=1.0)),
        ("aces", dict(tonemap="aces")),
    ):
        run_variant(label, args.seconds, backend=backend, overrides=ov, **kw)


if __name__ == "__main__":
    main()
