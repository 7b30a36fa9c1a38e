"""Probe 23 — per-lane gathered grid traversal: is it worth building?

VERDICT r4 #1: the brute sweep is test-throughput-saturated (~25 G
primitive-tests/s — stress1024 24.3 Mray/s, stress4096 8.7); the only path
to faster many-primitive scenes is FEWER TESTS PER RAY, and round 4's
lane-axis gather (tracer.gather_texels, probe21b) provides the per-lane
dynamic fetch ops/accel.py's round-2 premise said was impossible.

This probe answers, BEFORE building the traversal:

Part A (`sim`, host-only, free): vectorized numpy simulation of the exact
flat-cursor walk the kernel would run — every lane holds a cursor
(cell, k) and per iteration either TESTS one gathered primitive or
ADVANCES its DDA one cell; the loop runs until every lane in a tile is
done, so the iteration count IS the kernel's masked-loop trip count.
Reports per-ray tests/steps and per-2048-lane-tile max trips (the cost
driver) for primary AND decorrelated bounce rays, across grid resolution
factors, plus a lane-op cost model vs the brute sweep.

Part B (`tpu`): minimal Pallas A/B of the real mechanism — a gathered
closest-hit walk vs the ArrayPrims brute fori sweep on the same ray
population — run on the real chip.

Findings feed ops/gathered.py (or a measured refutation in NOTES.md).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

RAY_EPS = 1e-3
T_FAR = 3.0e38


def load(name):
    from terminal_raytracer_tpu.models import load_scene

    return load_scene(name)


def scene_arrays(scene):
    """Sphere SoA + plane list (stress/mesh scenes: spheres + 1 floor)."""
    import terminal_raytracer_tpu.models.scene as sm

    cx = np.array([s.center[0] for s in scene.spheres], np.float32)
    cy = np.array([s.center[1] for s in scene.spheres], np.float32)
    cz = np.array([s.center[2] for s in scene.spheres], np.float32)
    r = np.array([s.radius for s in scene.spheres], np.float32)
    tris = None
    if scene.triangles:
        v0 = np.array([t.v0 for t in scene.triangles], np.float32)
        v1 = np.array([t.v1 for t in scene.triangles], np.float32)
        v2 = np.array([t.v2 for t in scene.triangles], np.float32)
        tris = (v0, v1 - v0, v2 - v0)
    planes = [(np.array(p.point, np.float32), np.array(p.normal, np.float32))
              for p in scene.planes]
    del sm
    return (cx, cy, cz, r), tris, planes


def primary_rays(scene, stride=1):
    """Pinhole rays at pixel centers (jitter irrelevant for walk stats)."""
    from terminal_raytracer_tpu.models.camera import Camera

    cam = Camera()
    fwd, right, up = cam.basis()
    w, h = scene.width, scene.height
    half_h = np.tan(np.float32(scene.fov_rad) / 2)
    half_w = (np.float32(w) / np.float32(h)) * half_h
    inv_ca = 1.0 / np.float32(scene.camera.char_aspect_ratio)
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    xf = xs.ravel().astype(np.float32)
    yf = ys.ravel().astype(np.float32)
    u = (xf + 0.5) / np.float32(w - 1)
    v = ((h - 1) - yf + 0.5) / np.float32(h - 1)
    vx = half_w * (2 * u - 1)
    vy = half_h * (2 * v - 1) * inv_ca
    d = (right[None] * vx[:, None] + up[None] * vy[:, None] + fwd[None])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cam.position, d.shape).copy()
    return o.astype(np.float32), d.astype(np.float32)


def brute_closest(o, d, sph, tris, planes):
    """Reference answer + per-ray closest t (for bounce-ray generation)."""
    n = len(o)
    t_best = np.full(n, T_FAR, np.float32)
    n_best = np.zeros((n, 3), np.float32)
    for p, nrm in planes:
        nrm_u = nrm / np.linalg.norm(nrm)
        denom = d @ nrm_u
        t = np.where(np.abs(denom) > 1e-12,
                     ((p - o) @ nrm_u) / np.where(denom == 0, 1, denom),
                     -1)
        ok = (t > RAY_EPS) & (t < t_best)
        t_best = np.where(ok, t, t_best)
        n_best = np.where(ok[:, None], nrm_u[None], n_best)
    cx, cy, cz, r = sph
    c = np.stack([cx, cy, cz], 1)
    for i in range(len(cx)):
        oc = o - c[i]
        b = np.einsum("ij,ij->i", oc, d)
        cc = np.einsum("ij,ij->i", oc, oc) - r[i] * r[i]
        disc = b * b - cc
        sq = np.sqrt(np.maximum(disc, 0))
        t = np.where(-b - sq > RAY_EPS, -b - sq,
                     np.where(-b + sq > RAY_EPS, -b + sq, -1))
        ok = (disc > 0) & (t > RAY_EPS) & (t < t_best)
        t_best = np.where(ok, t, t_best)
        hitp = o + d * t[:, None]
        nn = (hitp - c[i]) / r[i]
        n_best = np.where(ok[:, None], nn, n_best)
    if tris is not None:
        v0, e1, e2 = tris
        for i in range(len(v0)):
            pv = np.cross(d, e2[i])
            det = pv @ e1[i]
            inv = 1.0 / np.where(np.abs(det) < 1e-12, 1, det)
            s = o - v0[i]
            uu = np.einsum("ij,ij->i", s, pv) * inv
            qv = np.cross(s, np.broadcast_to(e1[i], s.shape))
            vv = (qv @ d.T).diagonal() if False else np.einsum(
                "ij,ij->i", qv, d) * inv
            t = np.einsum("ij,j->i", qv, e2[i]) * inv
            ok = ((np.abs(det) > 1e-12) & (uu >= 0) & (vv >= 0)
                  & (uu + vv <= 1) & (t > RAY_EPS) & (t < t_best))
            t_best = np.where(ok, t, t_best)
            nrm = np.cross(e1[i], e2[i])
            nrm = nrm / np.linalg.norm(nrm)
            n_best = np.where(ok[:, None], nrm[None], n_best)
    return t_best, n_best


def bounce_rays(o, d, t_best, n_best, rng):
    """Decorrelated diffuse bounce rays from the primary hit points."""
    hit = t_best < T_FAR
    p = o + d * t_best[:, None]
    n = n_best.copy()
    # face the incoming ray
    flip = np.einsum("ij,ij->i", d, n) > 0
    n[flip] *= -1
    # cosine-ish hemisphere
    v = rng.normal(size=p.shape).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    nd = n + v * 0.999
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    o2 = p + n * 1e-3
    return o2[hit].astype(np.float32), nd[hit].astype(np.float32)


def walk_stats(grid, o, d, sph, tris, planes, tile=2048, label="",
               shuffle=False, rng=None):
    """Vectorized flat-cursor walk: per iteration each active lane either
    tests one primitive of its current cell or DDA-advances one cell.
    Returns per-ray (tests, steps, trips) and per-tile max trips."""
    n = len(o)
    if shuffle:
        perm = rng.permutation(n)
        o, d = o[perm], d[perm]
    gmin = grid.grid_min
    inv_cs = grid.inv_cell_size
    dims = grid.dims.astype(np.int64)
    offsets, indices = grid.offsets, grid.indices
    cx, cy, cz, r = sph
    cs = np.stack([cx, cy, cz], 1)

    # Plane pre-pass caps t_best (the kernel sweeps planes densely first).
    t_best = np.full(n, T_FAR, np.float32)
    for p, nrm in planes:
        nrm_u = nrm / np.linalg.norm(nrm)
        denom = d @ nrm_u
        t = np.where(np.abs(denom) > 1e-12,
                     ((p - o) @ nrm_u) / np.where(denom == 0, 1, denom), -1)
        ok = t > RAY_EPS
        t_best = np.where(ok & (t < t_best), t, t_best)

    cell = 1.0 / inv_cs
    # Ray/grid AABB clip -> entry t (or inactive).
    lo = gmin
    hi = gmin + cell * dims
    t0 = np.zeros(n, np.float32)
    t1 = np.full(n, T_FAR, np.float32)
    for ax in range(3):
        da = d[:, ax]
        par = np.abs(da) < 1e-12
        inv = 1.0 / np.where(par, 1.0, da)
        a = (lo[ax] - o[:, ax]) * inv
        b = (hi[ax] - o[:, ax]) * inv
        amin, amax = np.minimum(a, b), np.maximum(a, b)
        inside = (o[:, ax] >= lo[ax]) & (o[:, ax] <= hi[ax])
        amin = np.where(par, np.where(inside, 0.0, T_FAR), amin)
        amax = np.where(par, np.where(inside, T_FAR, 0.0), amax)
        t0 = np.maximum(t0, amin)
        t1 = np.minimum(t1, amax)
    active = (t0 <= t1) & (t0 < t_best)

    # Initial cell + DDA state.
    t_in = np.maximum(t0, 0.0)
    pos = o + d * (t_in[:, None] + 1e-5)
    ic = np.clip(((pos - lo) * inv_cs).astype(np.int64), 0, dims - 1)
    step = np.where(d >= 0, 1, -1).astype(np.int64)
    inv_d = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    nxt = lo + (ic + (step > 0)) * cell
    t_max = np.abs((nxt - o) * inv_d).astype(np.float32)
    t_max = np.where(np.abs(d) < 1e-12, T_FAR, t_max)
    t_delta = np.abs(cell * inv_d).astype(np.float32)

    def cell_id(ic):
        return ic[:, 0] + ic[:, 1] * dims[0] + ic[:, 2] * dims[0] * dims[1]

    ci = cell_id(ic)
    cur = offsets[np.clip(ci, 0, len(offsets) - 2)].astype(np.int64)
    end = offsets[np.clip(ci, 0, len(offsets) - 2) + 1].astype(np.int64)
    cur = np.where(active, cur, 0)
    end = np.where(active, end, 0)

    tests = np.zeros(n, np.int64)
    steps = np.zeros(n, np.int64)
    trips = np.zeros(n, np.int64)
    it = 0
    while active.any():
        it += 1
        has_work = active & (cur < end)
        # --- test block (masked) ---
        pid = indices[np.clip(cur, 0, len(indices) - 1)]
        oc = o - cs[pid]
        b = np.einsum("ij,ij->i", oc, d)
        cc = np.einsum("ij,ij->i", oc, oc) - r[pid] ** 2
        disc = b * b - cc
        sq = np.sqrt(np.maximum(disc, 0))
        t = np.where(-b - sq > RAY_EPS, -b - sq,
                     np.where(-b + sq > RAY_EPS, -b + sq, -1))
        ok = has_work & (disc > 0) & (t > RAY_EPS) & (t < t_best)
        t_best = np.where(ok, t, t_best)
        cur = np.where(has_work, cur + 1, cur)
        tests += has_work
        # --- advance block (masked) ---
        adv = active & ~has_work
        ax = np.argmin(t_max, 1)
        t_exit = t_max[np.arange(n), ax]
        done = adv & (t_exit > t_best)  # early termination
        ic2 = ic.copy()
        ic2[np.arange(n), ax] += step[np.arange(n), ax]
        oob = (ic2[np.arange(n), ax] < 0) | (
            ic2[np.arange(n), ax] >= dims[ax])
        done |= adv & oob
        move = adv & ~done
        t_max2 = t_max.copy()
        t_max2[np.arange(n), ax] += t_delta[np.arange(n), ax]
        ic = np.where(move[:, None], ic2, ic)
        t_max = np.where(move[:, None], t_max2, t_max)
        ci = cell_id(np.clip(ic, 0, dims - 1))
        new_cur = offsets[np.clip(ci, 0, len(offsets) - 2)].astype(np.int64)
        new_end = offsets[np.clip(ci, 0, len(offsets) - 2) + 1].astype(
            np.int64)
        cur = np.where(move, new_cur, cur)
        end = np.where(move, new_end, end)
        steps += adv
        trips += active
        active = active & ~done
        if it > 100000:
            raise RuntimeError("walk did not terminate")

    n_tiles = max(1, n // tile)
    tile_trips = trips[: n_tiles * tile].reshape(n_tiles, tile)
    tmax = tile_trips.max(1)
    return dict(
        label=label,
        n=n,
        tests_mean=float(tests.mean()), tests_p99=float(
            np.percentile(tests, 99)), tests_max=int(tests.max()),
        steps_mean=float(steps.mean()),
        trips_mean=float(trips.mean()),
        trips_p99=float(np.percentile(trips, 99)),
        trips_max=int(trips.max()),
        tile_max_mean=float(tmax.mean()),
        tile_max_worst=int(tmax.max()),
    ), t_best


def cost_model(nprim, nnz, ncells, res, tris=False):
    """Lane-op estimate per flat iteration (gather_texels row sweeps at
    ~4 vector ops/row, probe21b) and per brute primitive test."""
    idx_rows = -(-nnz // 128)
    geom_ch = 9 if tris else 4
    geom_rows_per_ch = -(-nprim // 128)
    off_rows = -(-(ncells + 1) // 128)
    c_test = idx_rows * 4 + geom_ch * geom_rows_per_ch * 4 + (40 if tris
                                                              else 25)
    c_adv = 30 + off_rows * 6
    c_iter = c_test + c_adv + 10
    c_brute = (60 if tris else 35)
    return c_iter, c_brute


def run_sim(args):
    from terminal_raytracer_tpu.ops import grid as grid_mod

    rng = np.random.RandomState(7)
    for name in args.scenes:
        scene = load(name)
        sph, tris, planes = scene_arrays(scene)
        nprim = len(sph[0]) + (len(tris[0]) if tris else 0)
        if tris is not None:
            print(f"== {name}: {nprim} prims (triangle walk not simulated "
                  f"— sphere-field stats transfer; cost model covers tris)")
            continue
        o, d = primary_rays(scene)
        tb, nb = brute_closest(o, d, sph, tris, planes)
        o2, d2 = bounce_rays(o, d, tb, nb, rng)
        # shadow rays: hit points toward the light sphere (prim 0)
        hit = tb < T_FAR
        p = (o + d * tb[:, None])[hit]
        nn = nb[hit]
        lc = np.array([sph[0][0], sph[1][0], sph[2][0]], np.float32)
        sd = lc[None] - p
        sd /= np.linalg.norm(sd, axis=1, keepdims=True)
        o3, d3 = (p + nn * 1e-3).astype(np.float32), sd.astype(np.float32)
        print(f"== {name}: {nprim} prims, {len(o)} primary rays, "
              f"{len(o2)} bounce rays")
        import dataclasses

        scene_nop = dataclasses.replace(scene, planes=())
        for factor in args.factors:
            g = grid_mod.build_uniform_grid(scene_nop, factor=factor)
            ncells = g.cell_count
            nnz = len(g.indices)
            occupied = (np.diff(g.offsets) > 0).mean()
            c_iter, c_brute = cost_model(nprim, nnz, ncells, factor)
            brute_ops = nprim * c_brute
            print(f"  factor {factor}: dims {tuple(g.dims)} cells {ncells} "
                  f"nnz {nnz} occ-cells {occupied:.2f} "
                  f"c_iter {c_iter} brute_ops {brute_ops}")
            for label, (oo, dd, sh) in {
                "primary(rowmajor)": (o, d, False),
                "primary(shuffled)": (o, d, True),
                "bounce(shuffled)": (o2, d2, True),
                "shadow(shuffled)": (o3, d3, True),
            }.items():
                st, t_walk = walk_stats(g, oo, dd, sph, tris, planes,
                                        label=label, shuffle=sh, rng=rng)
                if label == "primary(rowmajor)":
                    # correctness: walk closest == brute closest
                    bad = np.abs(t_walk - tb) > 1e-4 * np.maximum(tb, 1)
                    assert not bad.any(), (
                        f"walk/brute mismatch on {bad.sum()} rays")
                gain = brute_ops / max(st["tile_max_mean"] * c_iter, 1)
                print(f"    {label:18s} tests {st['tests_mean']:6.1f} "
                      f"steps {st['steps_mean']:6.1f} "
                      f"trips p99 {st['trips_p99']:6.0f} "
                      f"tile-max mean {st['tile_max_mean']:6.0f} "
                      f"worst {st['tile_max_worst']:5d} "
                      f"-> model gain x{gain:.2f}")


def run_tpu(args):
    """Part B: real-TPU A/B of accel='gathered' vs 'array' through the
    shipped sorted pipeline (the per-bounce walk form — VERDICT r4 #1's
    direct question), plus an on-TPU pallas-vs-jnp ray-count gate."""
    import time

    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.runtime import init_state, make_render_step

    pose = Camera().pose()

    # Correctness gate first (small render, both backends, gathered).
    scene0 = load_scene("stress:128").with_overrides(
        width=64, height=24, samples_per_pixel=8, max_depth=4)
    outs = {}
    for backend in ("jnp", "pallas"):
        step = make_render_step(scene0, backend=backend, accel="gathered")
        st = init_state(scene0)
        out = step(st, pose, np.uint32(7), np.int32(0))
        outs[backend] = (float(jax.device_get(out.rays)),
                         np.asarray(jax.device_get(out.state.acc)))
    print("gate: rays jnp", outs["jnp"][0], "pallas", outs["pallas"][0],
          "exact:", outs["jnp"][0] == outs["pallas"][0],
          "acc maxrel:",
          float(np.abs(outs["jnp"][1] - outs["pallas"][1]).max()
                / max(np.abs(outs["jnp"][1]).max(), 1e-9)), flush=True)

    for name in args.scenes:
        scene, _cam = load_scene(name), None
        for accel in args.accels:
            step = make_render_step(scene, backend="pallas", accel=accel)
            state = init_state(scene)
            out = step(state, pose, np.uint32(1), np.int32(0))
            jax.device_get(out.rays)
            state = out.state
            frame = 1
            reps = []
            occ = None
            for _ in range(args.reps):
                rays = []
                t0 = time.perf_counter()
                for _ in range(args.frames):
                    out = step(state, pose, np.uint32(1 + frame),
                               np.int32(frame))
                    state = out.state
                    rays.append(out.rays)
                    frame += 1
                total = float(sum(jax.device_get(rays)))
                dt = time.perf_counter() - t0
                reps.append(total / dt / 1e6)
                occ = float(jax.device_get(out.occupancy))
            print(f"{name} accel={accel}: "
                  f"{' '.join(f'{m:.1f}' for m in reps)} Mray/s "
                  f"(occ {occ:.3f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("sim")
    s.add_argument("--scenes", nargs="+",
                   default=["stress:256", "stress:1024", "stress:4096"])
    s.add_argument("--factors", nargs="+", type=float,
                   default=[1.5, 2.5, 4.0])
    s.set_defaults(fn=run_sim)
    t = sub.add_parser("tpu")
    t.add_argument("--scenes", nargs="+",
                   default=["stress:256", "stress:1024"])
    t.add_argument("--accels", nargs="+", default=["array", "gathered"])
    t.add_argument("--frames", type=int, default=96)
    t.add_argument("--reps", type=int, default=2)
    t.set_defaults(fn=run_tpu)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
