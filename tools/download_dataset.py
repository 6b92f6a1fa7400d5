#!/usr/bin/env python
"""Fetch the MIT-CGH-4K ``.bin`` dataset the reference trains on.

The reference README distributes the converted dataset via Google Drive and
depends on ``gdown`` (reference requirements.txt, README.md:28-38).  This
helper mirrors that workflow; in an egress-free environment it only prints
the instructions.

Usage:
    python tools/download_dataset.py --out data/ [--subset test_384]
"""

import argparse
import os

# Drive file ids from the reference README (README.md:115-118 and dataset
# section).  Keys are <subset>/<file>.
DRIVE_FILES = {
    "test_384/img.bin": "14spMaIZHPF2qLEp63TRj2DHpCQPFYv8M",
    "test_384/depth.bin": "1HH72XCbAVictz2vvCmWAPN7_46H-5ky8",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data")
    ap.add_argument("--subset", default=None, help="e.g. test_384")
    args = ap.parse_args()

    try:
        import gdown  # noqa: F401
    except ImportError:
        print("gdown is not installed; download manually from the reference "
              "repo's README links and place the .bin files under "
              f"{args.out}/<subset>/.")
        for name, fid in DRIVE_FILES.items():
            print(f"  {name}: https://drive.google.com/uc?id={fid}")
        return 1

    import gdown

    for name, fid in DRIVE_FILES.items():
        if args.subset and not name.startswith(args.subset + "/"):
            continue
        dest = os.path.join(args.out, name)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if os.path.exists(dest):
            print(f"{dest} exists, skipping")
            continue
        gdown.download(id=fid, output=dest, quiet=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
