#!/usr/bin/env python
"""
Compare two results.json files within a relative tolerance.

This is the final leg of the parity pipeline (scripts/bootstrap_artifacts.sh):
once the released reference checkpoints are converted and evaluated, the
BASELINE.md acceptance criterion is "PSNR/SSIM/LPIPS within 1%". This tool
makes that check a single command:

    python scripts/compare_results.py OURS.json REFERENCE.json --tol_pct 1.0

Both files use the shared results.json schema
(reference ``lib/metrics.py:95-126``; ours ``train/metrics.py::to_json``):
``{metric: {"mean": float, "framewise": [...]}}`` plus optional honesty flags
(``lpips.comparable``, ``decode_quant``, ``tokenizer_fallback``).

Exit code 0 = every compared metric is inside the tolerance; 1 = at least one
is outside (or a requested metric is missing); 2 = the comparison itself is
invalid (a non-comparable honesty flag on either side) unless
``--allow_flagged`` is given.
"""

import argparse
import json
import sys

METRICS = ("psnr", "ssim", "lpips")


def load(path: str) -> dict:
    with open(path) as f:
        res = json.load(f)
    if not isinstance(res, dict):
        raise SystemExit(f"{path}: not a results.json object")
    return res


def honesty_problems(results: dict, path: str) -> list:
    """Flags that make cross-implementation comparison dishonest."""
    problems = []
    lpips = results.get("lpips")
    if isinstance(lpips, dict) and lpips.get("comparable") is False:
        problems.append(f"{path}: lpips.comparable=false (random-projection "
                        "LPIPS fallback — export real weights first, see "
                        "scripts/export_lpips_weights.py)")
    if results.get("tokenizer_fallback"):
        problems.append(f"{path}: tokenizer_fallback=true (hash-id tokens, "
                        "not the real T5 vocab)")
    if results.get("decode_quant"):
        problems.append(f"{path}: decode_quant={results['decode_quant']!r} "
                        "(quantized decode changes outputs; compare bf16 runs)")
    return problems


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[1])
    parser.add_argument("ours")
    parser.add_argument("reference")
    parser.add_argument("--tol_pct", type=float, default=1.0,
                        help="max |ours-ref|/|ref| in percent (default 1.0, "
                             "the BASELINE.md criterion)")
    parser.add_argument("--metrics", nargs="+", default=list(METRICS),
                        help="metrics to compare (default: psnr ssim lpips)")
    parser.add_argument("--framewise", action="store_true",
                        help="also require every per-frame value within "
                             "tolerance, not just the means")
    parser.add_argument("--allow_flagged", action="store_true",
                        help="proceed despite honesty flags (fallback LPIPS/"
                             "tokenizer or quantized decode) on either side")
    args = parser.parse_args(argv)

    ours, ref = load(args.ours), load(args.reference)

    problems = honesty_problems(ours, args.ours) + honesty_problems(ref, args.reference)
    if problems:
        for p in problems:
            print(f"FLAGGED: {p}", file=sys.stderr)
        if not args.allow_flagged:
            print("comparison refused (use --allow_flagged to override)",
                  file=sys.stderr)
            return 2

    failed = False
    rows = []
    for m in args.metrics:
        o, r = ours.get(m), ref.get(m)
        if not isinstance(o, dict) or not isinstance(r, dict):
            rows.append((m, None, None, None, "MISSING"))
            failed = True
            continue
        om, rm = float(o["mean"]), float(r["mean"])
        rel = abs(om - rm) / max(abs(rm), 1e-12) * 100.0
        ok = rel <= args.tol_pct
        if ok and args.framewise:
            of, rf = o.get("framewise") or [], r.get("framewise") or []
            if len(of) != len(rf):
                ok = False
            else:
                ok = all(abs(a - b) / max(abs(b), 1e-12) * 100.0 <= args.tol_pct
                         for a, b in zip(of, rf))
        rows.append((m, om, rm, rel, "ok" if ok else "FAIL"))
        failed = failed or not ok

    width = max(len(m) for m, *_ in rows)
    for m, om, rm, rel, status in rows:
        if om is None:
            print(f"{m:<{width}}  missing on one side                      {status}")
        else:
            print(f"{m:<{width}}  ours={om:<12g} ref={rm:<12g} "
                  f"delta={rel:6.3f}%  (tol {args.tol_pct}%)  {status}")
    print("PARITY: " + ("FAIL" if failed else "PASS"))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
