"""Driver-path compile-cache canary (r3 VERDICT #5).

The driver's end-of-round bench runs `python bench.py` in a CLEAN checkout:
only COMMITTED `.jax_cache` entries exist there, so a missing entry for the
driver-path programs costs ~90 s of XLA compile in the recorded number
(r3: "prefill+compile: 98.2s" — the decode_segment entries were committed
and hit, the prefill_init entry was never committed).

This tool simulates that run: it snapshots `.jax_cache`, runs `bench.py`
(tiny --segments so decode wall is small), and reports
  * which NEW cache files appeared (each one = a compile-cache MISS on a
    program the driver will also compile),
  * the prefill+compile and decode-compile wall times bench.py printed.
Exit 1 if any miss occurred or the prefill wall exceeds --max-prefill-secs.

Run it AFTER any refactor that touches jitted code, then commit the newly
created entries (`git add -f .jax_cache/<file>`) so the driver starts warm:

    python tools/check_compile_cache.py            # expect: all HIT
    git add -f .jax_cache/jit_prefill_init-* ...   # on misses

Use --clean-clone to run from a pristine `git clone` of HEAD in /tmp —
the exact driver situation (requires the TPU to be free).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(repo: Path, extra_env=None):
    env = dict(os.environ)
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, "bench.py", "--segments", "1"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800,
    )
    out = proc.stdout + proc.stderr
    m_pre = re.search(r"prefill\+compile: ([\d.]+)s", out)
    m_dec = re.search(r"decode compile\+warmup: ([\d.]+)s", out)
    return (
        proc.returncode,
        float(m_pre.group(1)) if m_pre else None,
        float(m_dec.group(1)) if m_dec else None,
        out,
    )


def sync_cache(apply: bool) -> int:
    """--prune: recompute the LIVE driver-path program set by running
    bench.py against an EMPTY cache in a clean clone (every file it creates
    is a driver-path program, keyed by content hash), then diff against the
    committed set: stale committed blobs are pruned and missing live blobs
    staged, so each jit-path refactor swaps exactly the live programs
    (r4 VERDICT #9 — the refresh used to be manual and left strays).

    ORDER MATTERS: commit your code changes FIRST — the live set is
    computed from a clone of HEAD, so running --prune with the refactor
    still uncommitted syncs against the OLD programs."""
    tmp = Path(tempfile.mkdtemp(prefix="neutts_prune_"))
    subprocess.run(
        ["git", "clone", "--quiet", str(REPO), str(tmp / "repo")], check=True
    )
    repo = tmp / "repo"
    cache = repo / ".jax_cache"
    if cache.is_dir():
        for f in cache.iterdir():
            f.unlink()
    cache.mkdir(exist_ok=True)
    rc, t_pre, t_dec, out = run_bench(repo)
    if rc != 0:
        print(out[-2000:])
        return 1
    live = set(os.listdir(cache))
    committed = set(
        Path(p).name
        for p in subprocess.run(
            ["git", "ls-files", ".jax_cache"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    stale = sorted(committed - live)
    missing = sorted(live - committed)
    print(f"# live driver-path programs: {len(live)}; committed: "
          f"{len(committed)}; stale: {len(stale)}; missing: {len(missing)}")
    for f in stale:
        print(f"# stale   {f}")
        if apply:
            subprocess.run(["git", "rm", "-q", "-f", f".jax_cache/{f}"],
                           cwd=REPO, check=True)
    for f in missing:
        sz = (cache / f).stat().st_size
        print(f"# missing {f} ({sz/1e6:.1f} MB)")
        if apply:
            (REPO / ".jax_cache").mkdir(exist_ok=True)
            (REPO / ".jax_cache" / f).write_bytes((cache / f).read_bytes())
            subprocess.run(["git", "add", "-f", f".jax_cache/{f}"],
                           cwd=REPO, check=True)
    if apply and (stale or missing):
        print("# applied: stale entries removed, live entries staged — "
              "commit the result")
    elif not apply and (stale or missing):
        print("# re-run with --prune --apply to swap the committed set")
    else:
        print("# committed set == live set, nothing to do")
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-prefill-secs", type=float, default=20.0)
    ap.add_argument("--clean-clone", action="store_true",
                    help="clone HEAD into /tmp and bench there (the exact "
                    "driver situation: committed cache entries only)")
    ap.add_argument("--prune", action="store_true",
                    help="recompute the live driver-path program set from an "
                    "empty cache and diff it against the committed blobs")
    ap.add_argument("--apply", action="store_true",
                    help="with --prune: git-rm stale blobs and stage live ones")
    args = ap.parse_args()

    if args.prune:
        sys.exit(sync_cache(args.apply))

    if args.clean_clone:
        tmp = Path(tempfile.mkdtemp(prefix="neutts_clean_"))
        subprocess.run(
            ["git", "clone", "--quiet", str(REPO), str(tmp / "repo")],
            check=True,
        )
        repo = tmp / "repo"
    else:
        repo = REPO

    cache = repo / ".jax_cache"
    before = set(os.listdir(cache)) if cache.is_dir() else set()
    rc, t_pre, t_dec, out = run_bench(repo)
    after = set(os.listdir(cache)) if cache.is_dir() else set()
    new = sorted(after - before)

    print(f"# bench rc={rc} prefill+compile={t_pre}s decode-compile={t_dec}s")
    if rc != 0:
        print(out[-2000:])
        sys.exit(1)
    if new:
        print(f"# {len(new)} compile-cache MISSES (programs the driver will "
              "recompile cold):")
        for f in new:
            sz = (cache / f).stat().st_size
            print(f"#   {f}  ({sz/1e6:.1f} MB)")
        if args.clean_clone:
            print("# -> commit these from the working tree with "
                  "`git add -f .jax_cache/<file>` after reproducing there")
    else:
        print("# all driver-path programs HIT the committed cache")
    ok = not new and (t_pre is None or t_pre <= args.max_prefill_secs)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
