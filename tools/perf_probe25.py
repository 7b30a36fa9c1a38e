"""Round-5 probe: re-pin the INTERACTIVE north star at HEAD (VERDICT r4 #6).

BASELINE config 5's "32 fps incl. tunnel" is a round-1 measurement; the
engine has since gained the async display pipeline, the denoise/tonemap
epilogues, and the variance view. This probe drives the REAL interactive
loop — `python -m terminal_raytracer_tpu --scene demo` through a pty on
the live TPU (the same surface a user runs, reference contract
lib.rs:386-565) — steering continuously so every frame re-renders fresh
(a fly-through: each key resets accumulation), and reads the engine's own
status line for FPS / TPU / CPU / IO / Total ms. Variants: the default
pipeline, `--denoise 1`, and `--tonemap aces`, plus a `--no-pipeline`
run of the default (the reference's synchronous ordering).

    python tools/perf_probe25.py [--seconds 30]

ONE TPU process at a time (each variant is a fresh process, run
serially); every run exits via ESC — never kill it mid-grant.
"""

import argparse
import os
import pty
import re
import select
import statistics
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

STATUS = re.compile(
    rb"Frame: (\d+)/\d+ \| FPS: ([\d.]+) \| TPU: (\d+)ms \| CPU: (\d+)ms"
    rb" \| IO: (\d+)ms \| Other: (-?\d+)ms \| Total: (\d+)ms"
    rb" \| (\d+) Mray/s"
)


def run_variant(label, extra_args, seconds):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    master, slave = pty.openpty()
    import fcntl
    import struct
    import termios

    fcntl.ioctl(slave, termios.TIOCSWINSZ, struct.pack("HHHH", 110, 210, 0, 0))
    proc = subprocess.Popen(
        [sys.executable, "-m", "terminal_raytracer_tpu", "--scene", "demo"]
        + extra_args,
        stdin=slave, stdout=slave, stderr=subprocess.DEVNULL,
        cwd=REPO, env=env,
    )
    os.close(slave)
    buf = b""

    def pump(dt):
        # Drain EVERYTHING available: a 200x100 ANSI frame is ~100s of KB
        # and the child blocks (and stops polling keys!) the moment the
        # pty buffer fills — an un-drained pty deadlocks the whole loop.
        nonlocal buf
        deadline = time.time() + dt
        while True:
            left = deadline - time.time()
            r, _, _ = select.select([master], [], [], max(left, 0))
            if r:
                try:
                    buf += os.read(master, 1 << 20)
                except OSError:
                    return
            if left <= 0:
                return

    # Wait for the first frame (tunnel + compile: generous).
    deadline = time.time() + 420
    while b"Frame:" not in buf and time.time() < deadline:
        pump(0.3)
    if b"Frame:" not in buf:
        print(f"  {label}: NO FRAME within 420 s", flush=True)
        os.write(master, b"\x1b")
        proc.wait(timeout=120)
        os.close(master)
        return

    # Fly-through: alternate strafe keys so accumulation resets every
    # frame but the camera stays near the scene.
    keys = b"adad"
    t_end = time.time() + seconds
    i = 0
    warm_cut = len(buf)  # discard pre-steering status lines
    while time.time() < t_end:
        os.write(master, keys[i % len(keys):][:1])
        i += 1
        pump(0.1)
    os.write(master, b"\x1b")  # ESC: clean exit
    # Keep draining while waiting — the child may be mid-frame-write and
    # needs the pty emptied to reach its key poll.
    exit_deadline = time.time() + 180
    while proc.poll() is None and time.time() < exit_deadline:
        pump(0.2)
    if proc.poll() is None:
        print(f"  {label}: did not exit after ESC!", flush=True)
        while proc.poll() is None:
            pump(0.5)
    pump(0.2)
    os.close(master)

    rows = STATUS.findall(buf[warm_cut:])
    # Steady tail: drop the first quarter (rolling FPS warms over 30
    # frames), keep steering-phase lines only (Frame <= 2: every move
    # resets the counter).
    rows = rows[len(rows) // 4:]
    if not rows:
        print(f"  {label}: no status lines parsed", flush=True)
        return
    fps = statistics.median(float(r[1]) for r in rows)
    tpu = statistics.median(int(r[2]) for r in rows)
    cpu = statistics.median(int(r[3]) for r in rows)
    io = statistics.median(int(r[4]) for r in rows)
    tot = statistics.median(int(r[6]) for r in rows)
    mray = statistics.median(int(r[7]) for r in rows)
    print(f"  {label:14s}: FPS {fps:6.1f} | TPU {tpu:3.0f}ms | CPU {cpu:2.0f}ms"
          f" | IO {io:2.0f}ms | Total {tot:3.0f}ms | {mray:.0f} Mray/s"
          f"  ({len(rows)} frames)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()
    for label, extra in (
        ("default", []),
        ("no-pipeline", ["--no-pipeline"]),
        ("denoise1", ["--denoise", "1"]),
        ("aces", ["--tonemap", "aces"]),
    ):
        run_variant(label, extra, args.seconds)


if __name__ == "__main__":
    main()
