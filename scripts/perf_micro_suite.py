"""One parameterized entry point for the accreted perf microbenchmarks.

The perf_micro*.py files are one-shot hypothesis tests whose FINDINGS are
recorded in docs/PERF.md; they are kept verbatim (their numbers are cited
by round) and dispatched from here instead of being six separate entry
points.

Usage:  python scripts/perf_micro_suite.py <case> [case-args...]

| case | module | hypothesis it measured | round | outcome |
|---|---|---|---|---|
| layouts   | perf_micro.py  | (..., n)-trailing layouts fill VPU lanes; loop-invariant hoisting; sqrt-after-reduce; Pallas min-clearance | r2 | all four confirmed -> ops/geometry.py defaults |
| gradloss  | perf_micro2.py | full guidance-loss grad: fori_loop vs unrolled Adam; fusion splits | r2 | unrolled wins; shipped |
| tiled     | perf_micro3.py | TiledScorer vs round-1 per-row formula scorer | r2 | TiledScorer 3x; shipped |
| candminor | perf_micro4.py | candidate-minor (R-minor) layout for the guidance inner loop | r3 | ~2.3x; became cm_sampler |
| freeze    | perf_micro5.py | frozen argmin selections across Adam iterations | r3 | 1.135x metric-neutral; shipped default |
| kernel    | perf_micro6.py | Pallas mega-kernel freeze-vs-Adam cost split (niters sweep) | r3 | freeze+DMA intercept ~60%; motivated fuse_freeze + pack |

Each case runs on the REAL TPU (one process at a time) and prints its own
table; see the module docstrings for the full hypothesis text.
"""
import runpy
import sys
import os

_CASES = {
    "layouts": "perf_micro.py",
    "gradloss": "perf_micro2.py",
    "tiled": "perf_micro3.py",
    "candminor": "perf_micro4.py",
    "freeze": "perf_micro5.py",
    "kernel": "perf_micro6.py",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in _CASES:
        print(__doc__)
        print("cases:", ", ".join(_CASES))
        raise SystemExit(2)
    case = sys.argv.pop(1)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _CASES[case])
    sys.argv[0] = path
    runpy.run_path(path, run_name="__main__")


if __name__ == "__main__":
    main()
