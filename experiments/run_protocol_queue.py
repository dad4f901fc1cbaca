"""Background queue for the torch cross-check matrix (VERDICT r3 items 2/4).

torch's sparse CSR SpMM is effectively single-threaded on this host (889 ms
at 1 thread, 1068 ms at 4 — measured), so the queue runs N jobs concurrently
with OMP/MKL pinned to 1 thread each instead of one job across all cores:
~4x the throughput for the same silicon. Each job is one (driver, protocol,
model, hierarchy, seed) cell writing to its OWN csv under ``--out-dir``
(concurrent appends to one file could interleave); merge with::

    python experiments/run_protocol_queue.py --merge docs/protocol_results.csv

Job specs are lines of a plain text file (or the built-in matrix): a name,
then the driver argv. Progress/logs land next to the per-job CSVs.

    python experiments/run_protocol_queue.py --jobs /tmp/jobs.txt -P 3
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import csv
import os
import shlex
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(name: str, argv: list, out_dir: str) -> dict:
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        # torch-only jobs must never touch the TPU tunnel
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
    )
    log_path = os.path.join(out_dir, f"{name}.log")
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(
            [sys.executable] + argv, cwd=REPO, env=env,
            stdout=log, stderr=subprocess.STDOUT,
        )
    return {"name": name, "rc": proc.returncode,
            "wall_s": round(time.time() - t0, 1)}


def parse_jobs(path: str, out_dir: str):
    jobs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, rest = line.split(None, 1)
            argv = shlex.split(rest)
            # give every job its own CSV in out_dir
            argv += ["--out", os.path.join(out_dir, f"{name}.csv")]
            jobs.append((name, argv))
    return jobs


def merge(out_dir: str, target: str):
    """Append all per-job CSV rows into the shared protocol results file
    (and its ``.jsonl`` sibling, stamped with the job CSV's mtime), skipping
    rows already present (idempotent re-merge)."""
    import json

    seen = set()
    header = None
    if os.path.exists(target):
        with open(target) as f:
            r = csv.reader(f)
            header = next(r, None)
            for row in r:
                seen.add(tuple(row))
    jsonl = target + ".jsonl"
    added = 0
    for fn in sorted(os.listdir(out_dir)):
        if not fn.endswith(".csv"):
            continue
        path = os.path.join(out_dir, fn)
        ts = os.path.getmtime(path)
        with open(path) as f:
            r = csv.reader(f)
            h = next(r, None)
            if header is None:
                header = h
                with open(target, "w", newline="") as t:
                    csv.writer(t).writerow(header)
            for row in r:
                if tuple(row) in seen:
                    continue
                seen.add(tuple(row))
                with open(target, "a", newline="") as t:
                    csv.writer(t).writerow(row)
                if os.path.exists(jsonl):
                    rec = dict(zip(header, row))
                    for key in ("seed",):
                        rec[key] = int(rec[key])
                    for key in ("f1-macro", "accuracy"):
                        rec[key] = float(rec[key])
                    rec["ts"] = round(ts, 3)
                    with open(jsonl, "a") as t:
                        t.write(json.dumps(rec) + "\n")
                added += 1
    print(f"merged {added} new rows into {target}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--jobs", help="job-spec file: '<name> <driver argv...>'")
    ap.add_argument("--out-dir", default="docs/queue")
    ap.add_argument("-P", "--parallel", type=int, default=3)
    ap.add_argument("--merge", metavar="TARGET",
                    help="merge per-job CSVs into TARGET and exit")
    args = ap.parse_args(argv)

    if args.merge:
        merge(args.out_dir, args.merge)
        return
    os.makedirs(args.out_dir, exist_ok=True)
    jobs = parse_jobs(args.jobs, args.out_dir)
    print(f"{len(jobs)} jobs, {args.parallel} workers", flush=True)
    results = []
    with cf.ThreadPoolExecutor(max_workers=args.parallel) as ex:
        futs = {ex.submit(run_job, n, a, args.out_dir): n for n, a in jobs}
        for fut in cf.as_completed(futs):
            r = fut.result()
            results.append(r)
            state = "ok" if r["rc"] == 0 else f"FAILED rc={r['rc']}"
            print(f"[{len(results)}/{len(jobs)}] {r['name']}: {state} "
                  f"({r['wall_s']:.0f}s)", flush=True)
    bad = [r for r in results if r["rc"] != 0]
    print(f"done: {len(results) - len(bad)} ok, {len(bad)} failed", flush=True)
    return results


if __name__ == "__main__":
    main()
