"""Offline index integrity audit CLI.

    python scripts/fsck_cli.py --index-dir /tmp/idx [--skip-positions]

Exit code 0 = every invariant holds; 1 = violations (printed, bounded
at 50). See stacksearch_ray/fsck.py for the checked invariants.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--skip-positions", action="store_true",
                    help="skip decoding the positional sidecar")
    args = ap.parse_args()

    from stacksearch_ray.fsck import fsck_index

    rep = fsck_index(args.index_dir,
                     check_positions=not args.skip_positions)
    print(f"checked {rep.checked_docs} docs, "
          f"{rep.checked_segment_rows} segment rows")
    if rep.ok:
        print("OK: every invariant holds")
        return 0
    print(f"FAILED: {len(rep.errors)} violation(s)")
    for e in rep.errors:
        print(f"  - {e}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
