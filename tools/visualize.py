#!/usr/bin/env python
"""Draw detections on images using a serving artifact.

Debug/demo tool: runs the AOT artifact over a directory and writes
annotated JPEGs (boxes coloured per cone class).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CLASS_COLORS_BGR = {
    0: (40, 220, 230),   # yellow
    1: (200, 90, 30),    # blue
    2: (30, 110, 240),   # orange
    3: (10, 80, 250),    # large orange
}


def main() -> None:
    import cv2
    import numpy as np

    from unina_yolo_dla_tpu.runtime.serving import PerceptionServer

    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--output", default="annotated")
    p.add_argument("--input-size", type=int, default=640)
    p.add_argument("--classes", type=int, default=4)
    args = p.parse_args()

    srv = PerceptionServer(args.artifact, expected_input=args.input_size,
                           expected_classes=args.classes)
    srv.configure()
    srv.activate()

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    s = args.input_size
    n = 0
    for path in sorted(Path(args.images).iterdir()):
        if path.suffix.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        bgr = cv2.imread(str(path))
        if bgr is None:
            continue
        bgr = cv2.resize(bgr, (s, s))
        rgb = np.ascontiguousarray(bgr[..., ::-1])
        result = srv.process_frame(rgb)
        if result is None:
            continue
        for box, score, cls in zip(result["boxes"], result["scores"],
                                   result["classes"]):
            x1, y1, x2, y2 = (int(v) for v in box)
            color = CLASS_COLORS_BGR.get(int(cls), (255, 255, 255))
            cv2.rectangle(bgr, (x1, y1), (x2, y2), color, 2)
            cv2.putText(bgr, f"{int(cls)}:{score:.2f}", (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
        cv2.imwrite(str(out_dir / path.name), bgr)
        n += 1
    print(f"annotated {n} images -> {out_dir} ({srv.stats()})")
    srv.shutdown()


if __name__ == "__main__":
    main()
