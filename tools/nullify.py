"""Back-compat shim: the NULL-twin builder moved into tools/perturb.py
(one entry point for all four robustness modes).  CLI preserved:

    python -m tools.nullify [--src ...] [--out /tmp/sfnull]
"""

from __future__ import annotations

import argparse

from tools.perturb import NULL_KEYS as KEYS  # noqa: F401 — re-export
from tools.perturb import NULL_PLAN as PLAN  # noqa: F401 — re-export
from tools.perturb import build as _build


def build(src: str, out: str) -> None:
    _build("null", src, out)
    print(f"wrote NULL-injected tables to {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/sfnull")
    args = ap.parse_args()
    build(args.src, args.out)


if __name__ == "__main__":
    main()
