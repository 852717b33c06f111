#!/usr/bin/env python3
"""One-time HDF5 → parquet converter for the OLA wide frames (S3).

Spark has no native HDF5 source (SURVEY §2.1 S3), so the reference's
`shelly_data.h5` / `emonesp_data.h5` containers (pandas-HDF wide frames,
key="power", epoch-seconds index — OlaLoader.py:32-41, 65-68) are
converted once, driver-side, into wide parquet files that
`graft.sources.OlaSource.loadConverted` consumes.

Usage: python3 tools/h5_to_parquet.py <ola_dir> <out_dir>

Dev-only tool (driver-side python, like tools/compare.py); the engine
itself is Scala/Spark and never links HDF5.
"""
import sys
from pathlib import Path

import pandas as pd


def convert(src: Path, dst: Path) -> None:
    df = pd.read_hdf(src, key="power")
    df = df.reset_index()
    df = df.rename(columns={df.columns[0]: "timestamp"})
    # epoch seconds (the reference keeps the raw numeric index)
    if pd.api.types.is_datetime64_any_dtype(df["timestamp"]):
        df["timestamp"] = df["timestamp"].astype("int64") // 10**9
    df.to_parquet(dst, index=False)
    print(f"wrote {dst} ({len(df)} rows, {len(df.columns) - 1} channels)")


def main(ola_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    found = False
    for name in ("shelly_data", "emonesp_data"):
        src = Path(ola_dir) / f"{name}.h5"
        if src.exists():
            convert(src, out / f"{name}.parquet")
            found = True
    if not found:
        print(f"no shelly_data.h5 / emonesp_data.h5 under {ola_dir}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
