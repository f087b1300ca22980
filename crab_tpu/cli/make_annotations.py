"""Materialize annotation JSONs from official dataset layouts.

The reference hardcodes its cluster's dataset roots inside the dataset
builders (SURVEY §2.6.5); here the same constructors are parameterized
(``tasks/splits.py``) and this CLI writes the records to a JSON that
``cli/evaluate.py --annotations`` / ``cli/train.py --annotations`` consume.

Usage:
  python -m crab_tpu.cli.make_annotations --task ms3 --root /data/AVS \
      --split test --out ms3_test.json
  python -m crab_tpu.cli.make_annotations --task avqa \
      --annotation-json data/music_avqa/test_samples.json --out avqa.json
  python -m crab_tpu.cli.make_annotations --task ref-avs --root /data/REFAVS \
      --split test_n --out refavs_null.json
"""

from __future__ import annotations

import argparse
import json

from crab_tpu.tasks.splits import SPLIT_BUILDERS


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True, choices=sorted(SPLIT_BUILDERS))
    p.add_argument("--root", default="", help="dataset root directory")
    p.add_argument("--annotation-json", default="",
                   help="upstream annotation file (avqa/ave/avvp)")
    p.add_argument("--split", default="test",
                   help="train|test (ref-avs: train|test_s|test_u|test_n; "
                        "avcap: train|val)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    build = SPLIT_BUILDERS[args.task]
    if args.task == "avqa":
        records = build(args.annotation_json)
    elif args.task in ("ave", "avvp"):
        records = build(args.annotation_json, args.root)
    elif args.task == "avcap":
        records = build(args.root, args.split)
    else:
        records = build(args.root, args.split)

    with open(args.out, "w") as f:
        json.dump(records, f)
    print(f"{args.task}/{args.split}: {len(records)} records -> {args.out}")
    return records


if __name__ == "__main__":
    main()
