"""Round-3 probe: how many timed frames per rep until the rep-ending host
sync stops polluting the Mray/s number?

The bench protocol times a rep as: submit N frames (async, donated state),
then ONE jax.device_get of the per-frame ray counts — so each rep charges
exactly one host sync (~25-30 ms tunnel RTT in this dev setup; ~0.1 ms on
a PCIe TPU host) to N frames of device time. At the round-<=2 protocol's
N=48 that sync is NOT negligible: 48 frames of the 80x40 config is ~15 ms
of device work, so the measured rate was ~4-5x under the device rate, and
even the north star (48 x 4.2 ms = 200 ms) under-read ~13%.

This probe sweeps N per config and watches the measured Mray/s approach
the device rate as the sync amortizes (saturation = the true number).

Measured 2026-08-17 (v5e, this box):

  config                N=48   N=96   N=192  N=480  N=960
  Cornell 80x40 (x8)     228    448    729   1119   1135
  demo (chain x8)        151    191    223    249    260
  scene2 (chain x8)      332    463    548    632    656
  north star (per-frame) 1941   2114   2190   2230     —
  shipped 128spp         3898   4082   4156   4225     —

Conclusion: protocol v3 sets per-config timed-frame counts (bench.py
CONFIGS[...]["frames"]): 480 for per-frame-dispatched configs, 960 for the
chained small configs (192 for the >=10 ms/frame stress configs, where 192
frames already puts the sync under 2%). chain=8 itself was re-validated in
the same session: chain 16/32 within noise, chain=64 regresses.

    python tools/perf_probe19.py
"""

import statistics
import time

import numpy as np

import jax

from terminal_raytracer_tpu.models import Camera, load_scene
from terminal_raytracer_tpu.runtime import init_state, make_render_step
from terminal_raytracer_tpu.runtime.offline import make_chunk_renderer

CHAIN = 8


def chained(name, ov, frame_counts):
    scene = load_scene(name).with_overrides(**ov)
    pose = Camera().pose()
    render = make_chunk_renderer(scene, CHAIN, full_color=True)
    state = init_state(scene)

    def seeds(f):
        return (np.uint32(1) + np.arange(f, f + CHAIN,
                dtype=np.uint64)).astype(np.uint32)

    out, _ = render(state, pose, seeds(0), np.int32(0))
    jax.device_get(out.rays)
    state = out.state
    frame = CHAIN
    for frames in frame_counts:
        n_chunks = frames // CHAIN
        mrays = []
        for _ in range(3):
            rv = []
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                out, rk = render(state, pose, seeds(frame), np.int32(frame))
                state = out.state
                rv.append(rk)
                frame += CHAIN
            tot = float(sum(float(np.sum(r)) for r in jax.device_get(rv)))
            dt = time.perf_counter() - t0
            mrays.append(tot / dt / 1e6)
        print(f"{name} {scene.width}x{scene.height} chained x{CHAIN} "
              f"frames={frames}: median {statistics.median(mrays):.1f} "
              f"Mray/s (reps {', '.join(f'{m:.0f}' for m in mrays)})",
              flush=True)


def per_frame(name, ov, frame_counts):
    scene = load_scene(name).with_overrides(**ov)
    pose = Camera().pose()
    step = make_render_step(scene, full_color=True)
    state = init_state(scene)
    out = step(state, pose, np.uint32(1), np.int32(0))
    jax.device_get(out.rays)
    state = out.state
    frame = 1
    for frames in frame_counts:
        mrays = []
        for _ in range(3):
            rc = []
            t0 = time.perf_counter()
            for _ in range(frames):
                out = step(state, pose, np.uint32(1 + frame),
                           np.int32(frame))
                state = out.state
                rc.append(out.rays)
                frame += 1
            tot = float(sum(jax.device_get(rc)))
            dt = time.perf_counter() - t0
            mrays.append(tot / dt / 1e6)
        print(f"{name} spp={scene.samples_per_pixel} "
              f"depth={scene.max_depth} per-frame frames={frames}: median "
              f"{statistics.median(mrays):.1f} Mray/s "
              f"(reps {', '.join(f'{m:.0f}' for m in mrays)})", flush=True)


if __name__ == "__main__":
    chained("Cornell_Box", dict(width=80, height=40, samples_per_pixel=1,
                                max_depth=4), (48, 96, 192, 480, 960))
    chained("demo", {}, (48, 96, 192, 480, 960))
    chained("scene2", {}, (48, 96, 192, 480, 960))
    per_frame("Cornell_Box", dict(samples_per_pixel=16, max_depth=32),
              (48, 96, 192, 480))
    per_frame("Cornell_Box", {}, (48, 96, 192, 480))
