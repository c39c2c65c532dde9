"""Render detections over events + image frames to a video / image dir.

CLI mirror of the reference scripts/visualize_detections.py: consumes
the per-sequence detections_<seq>.npy files written by
run_test_interframe.py and composes event overlays + boxes.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import argparse

import numpy as np

from dagr_tpu.data.dsec import DSECSequence
from dagr_tpu.visualization.viz import draw_bbox_on_img, draw_events_on_image


def main():
    p = argparse.ArgumentParser("visualize detections")
    p.add_argument("--detections_folder", type=Path, required=True)
    p.add_argument("--sequence_path", type=Path, required=True)
    p.add_argument("--output_path", type=Path, default=Path("viz_out"))
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--conf", type=float, default=0.3)
    a = p.parse_args()

    import cv2

    seq = DSECSequence(a.sequence_path)
    det_file = a.detections_folder / f"detections_{seq.name}.npy"
    dets = np.load(det_file)
    a.output_path.mkdir(parents=True, exist_ok=True)

    for i in range(len(seq.timestamps) - 1):
        t0, t1 = int(seq.timestamps[i]), int(seq.timestamps[i + 1])
        img = seq.get_image(i)
        img = img[: 430]
        img = cv2.resize(img, (640 // a.scale, 430 // a.scale))
        ev = seq.get_events(t0, t1)
        img = draw_events_on_image(img, ev["x"], ev["y"], 2 * ev["p"].astype(int) - 1)
        sel = (dets["t"] >= t0) & (dets["t"] < t1)
        d = dets[sel]
        img = draw_bbox_on_img(img, d["x"], d["y"], d["w"], d["h"],
                               d["class_id"], d["class_confidence"],
                               conf=a.conf)
        cv2.imwrite(str(a.output_path / f"{i:06d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    print(f"wrote frames to {a.output_path}")


if __name__ == "__main__":
    main()
