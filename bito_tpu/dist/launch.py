"""Local multi-process launcher: CPU emulation of a multi-host job.

    python -m bito_tpu.dist.launch -n 2 [--devices-per-process K] script.py [args...]

Spawns N copies of script.py, each wired to a shared coordinator via the
BITO_* environment variables that multihost.initialize() reads, with K
virtual CPU devices per process (XLA_FLAGS host platform device count).
Exit status is nonzero if any worker fails; worker output is streamed with
a `[p<i>]` prefix.

On real multi-host TPU pods, do NOT use this launcher — start one process
per host through your cluster scheduler and pass --coordinator/--num-hosts/
--host-id (or the BITO_* env vars) yourself; see dist/multihost.py.
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import threading


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bito_tpu.dist.launch")
    ap.add_argument("-n", "--num-processes", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=1)
    ap.add_argument("script")
    ap.add_argument("script_args", nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)

    port = _free_port()
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        env["BITO_COORDINATOR"] = f"localhost:{port}"
        env["BITO_NUM_PROCESSES"] = str(args.num_processes)
        env["BITO_PROCESS_ID"] = str(pid)
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.devices_per_process}").strip()
        procs.append(subprocess.Popen(
            [sys.executable, args.script] + args.script_args,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))

    def pump(i, p):
        for line in p.stdout:
            sys.stdout.write(f"[p{i}] {line}")
            sys.stdout.flush()

    threads = [threading.Thread(target=pump, args=(i, p))
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    codes = [p.wait() for p in procs]
    for t in threads:
        t.join()
    if any(codes):
        sys.exit(f"workers exited with {codes}")


if __name__ == "__main__":
    main()
