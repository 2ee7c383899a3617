"""One-command real-data validation against the BASELINE north stars.

The environment this framework was built in has no network egress, so the
real Planetoid/PPI/PATTERN raw files are absent and training runs on
synthetic stand-ins. The moment real data exists, this script is the
north-star gate (BASELINE.md: Cora >= 83%, PPI micro-F1 >= 0.97 — GAT
paper Table 2, reproduced by the reference per its README.md:2,61):

    GAT_TPU_DATA=/path/to/datasets python examples/validate_real.py
    GAT_TPU_DATA=... python examples/validate_real.py --datasets Cora PPI

It trains each dataset with its reference hyperparameters
(utils/config.py == reference run_config.py:17-98), evaluates on the real
test split, and ASSERTS the thresholds — exit code 0 means the
reproduction bar is met.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Accuracy gates: GAT paper Table 2 center - 2*std (paper's own run
# variance); Cora pinned at the BASELINE.md north-star 0.83 exactly.
# PATTERN: the reference cites no number; the bar is the GNN-benchmark
# (Dwivedi et al., the paper the PATTERN dataset ships from) GAT
# weighted-accuracy figure ~85.5% minus the same 2-sigma-style slack the
# other rows carry (VERDICT r3 item 8 replaced the 0.50 placeholder).
# Keys are Trainer.evaluate's phase-prefixed test metrics.
THRESHOLDS = {
    "Cora": ("test_acc", 0.83),
    "Citeseer": ("test_acc", 0.711),      # 72.5 +- 0.7
    "Pubmed": ("test_acc", 0.784),        # 79.0 +- 0.3
    "PPI": ("test_f1", 0.97),             # BASELINE.md north star
    "PATTERN": ("test_weighted_acc", 0.845),  # ~85.5 - slack
}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="*", default=list(THRESHOLDS))
    p.add_argument("--platform", default=None)
    p.add_argument("--out", default=None, help="write results JSON here")
    p.add_argument("--allow_synthetic", action="store_true",
                   help="run anyway on synthetic stand-ins (smoke only; "
                        "thresholds are NOT asserted)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from gat_pytorch_tpu.cli.train import run as train_run
    from gat_pytorch_tpu.data import datasets
    from gat_pytorch_tpu.utils.config import get_config

    results, failures = {}, []
    for ds in args.datasets:
        synthetic = datasets.is_synthetic(ds)
        if synthetic and not args.allow_synthetic:
            print(f"[{ds}] real data not found under "
                  f"GAT_TPU_DATA={datasets.data_root()!r} — set it to the "
                  f"directory documented in data/datasets.py, or pass "
                  f"--allow_synthetic for a smoke run", file=sys.stderr)
            return 2
        cfg = get_config(ds)
        cfg.checkpoint_dir = None
        cfg.log_every = 0
        print(f"=== {ds} ({'SYNTHETIC' if synthetic else 'real'}) ===",
              flush=True)
        m = train_run(cfg)
        key, bar = THRESHOLDS[ds]
        got = m.get(key)
        results[ds] = {"metric": key, "value": got, "threshold": bar,
                       "synthetic": synthetic}
        if got is None:
            failures.append(f"{ds}: metric '{key}' missing from {sorted(m)}")
        elif not synthetic and got < bar:
            failures.append(f"{ds}: {key}={got:.4f} < {bar}")
        else:
            print(f"[{ds}] {key}={got:.4f} (bar {bar}"
                  f"{', not asserted: synthetic' if synthetic else ''})")

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    if failures:
        for f_ in failures:
            print("FAIL:", f_, file=sys.stderr)
        return 1
    print("all north-star thresholds met" if not any(
        r["synthetic"] for r in results.values())
        else "smoke run complete (synthetic; thresholds not asserted)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
