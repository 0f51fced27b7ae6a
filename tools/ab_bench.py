"""Interleaved A/B/A/B process-pair benchmark (see CLAUDE.md: timing
through the tunneled chip drifts in epochs between processes; only
in-process batched dispatch or interleaved process pairs are meaningful).

Usage:
  python tools/ab_bench.py ROUNDS 'NAME1=K=V,K=V' 'NAME2=K=V' ...

Runs bench.py under each env config, interleaved, ROUNDS times each;
reports per-config best (max columns/s).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys


def run_one(env_kv: dict) -> float:
    env = dict(os.environ)
    env.update(env_kv)
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(
            __file__))), timeout=900)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return float(json.loads(line)["value"])
    raise RuntimeError(f"no JSON from bench.py:\n{out.stdout}\n{out.stderr}")


def main():
    rounds = int(sys.argv[1])
    configs = []
    for spec in sys.argv[2:]:
        name, _, kvs = spec.partition("=")
        kv = {}
        if kvs:
            for pair in kvs.split(","):
                k, _, v = pair.partition("=")
                kv[k] = v
        configs.append((name, kv))
    results = {name: [] for name, _ in configs}
    for r in range(rounds):
        for name, kv in configs:
            v = run_one(kv)
            results[name].append(v)
            print(f"round {r} {name:<16} {v:12.0f} cols/s", flush=True)
    print("\n=== best-of per config ===")
    for name, vals in results.items():
        print(f"{name:<16} best {max(vals):12.0f}  all "
              f"{[round(v) for v in vals]}")


if __name__ == "__main__":
    main()
