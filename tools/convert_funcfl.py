"""Convert DYNAMO funcfl EAM table files to the framework's npz format.

Usage: python tools/convert_funcfl.py <funcfl-file> [more files...] -o out.eam.npz
Each invocation produces one (possibly multi-element) table set.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from surface_sampling_tpu.potentials.eam import (  # noqa: E402
    parse_funcfl,
    save_tables_npz,
    tables_from_funcfl,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args()
    tables = tables_from_funcfl([parse_funcfl(f) for f in args.files])
    save_tables_npz(args.out, tables)
    print(f"wrote {args.out}: elements Z={tables.numbers.tolist()}, "
          f"nrho={tables.nrho}, nr={tables.nr}, cutoff={tables.cutoff}")


if __name__ == "__main__":
    main()
