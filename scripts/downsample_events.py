"""Downsample an events.h5 stream 2x spatially (events_2x.h5 producer).

CLI mirror of the reference scripts/downsample_events.py:127-163.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import argparse

from dagr_tpu.data.downsample import downsample_file


def main():
    p = argparse.ArgumentParser("Downsample events")
    p.add_argument("--input_path", type=Path, required=True)
    p.add_argument("--output_path", type=Path, required=True)
    p.add_argument("--input_height", type=int, default=480)
    p.add_argument("--input_width", type=int, default=640)
    p.add_argument("--output_height", type=int, default=240)
    p.add_argument("--output_width", type=int, default=320)
    a = p.parse_args()
    downsample_file(a.input_path, a.output_path,
                    a.input_height, a.input_width,
                    a.output_height, a.output_width)
    print(f"wrote {a.output_path}")


if __name__ == "__main__":
    main()
