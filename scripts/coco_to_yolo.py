#!/usr/bin/env python
"""Convert a COCO-format dataset to the YOLO directory layout the trainer
consumes (train/data.py; same convention as ultralytics):

    python scripts/coco_to_yolo.py --ann instances_train.json \
        --images /data/coco/train2017 --out datasets/train

Then fine-tune on it:

    python -m zero_latency_yolo_tpu.train.loop --data datasets/train \
        --variant yolov8n --size 416 --classes <C>

Images are symlinked (not copied); labels are normalized center-format;
COCO category ids remap to contiguous [0, C) ascending (written to
out/classes.txt). iscrowd annotations are skipped by default.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", required=True, help="COCO annotation .json")
    ap.add_argument("--images", required=True, help="directory of images the "
                    "annotation file_names refer to")
    ap.add_argument("--out", required=True, help="output dataset root "
                    "(images/ + labels/ created inside)")
    ap.add_argument("--keep-crowd", action="store_true",
                    help="keep iscrowd=1 annotations (skipped by default)")
    args = ap.parse_args()

    from zero_latency_yolo_tpu.train.data import coco_to_yolo
    n, cat_map = coco_to_yolo(args.ann, args.images, args.out,
                              skip_crowd=not args.keep_crowd)
    print(f"wrote {n} images, {len(cat_map)} classes -> {args.out} "
          f"(train with --classes {len(cat_map)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
