"""Official-dataset split builders — the UnifiedTestDataset/UnifiedDataset
sample constructors (``dataset/unified_dataset.py:156-680`` train,
``:1274-2261`` test) as pure functions over the official directory layouts,
emitting the record dicts the task registry / TrainDataset consume.

Unlike the reference, dataset roots are arguments (no hardcoded cluster
paths — quirk SURVEY §2.6.5) and every builder works for train and test
splits. Use ``cli/make_annotations.py`` to materialize JSONs.
"""

from __future__ import annotations

import csv
import json
import os
from os.path import join
from typing import Dict, List


def _load_json(path: str):
    with open(path) as f:
        return json.load(f)


def avqa_split(annotation_json: str) -> List[Dict]:
    """MUSIC-AVQA: media paths ship inside the annotation file
    (``unified_dataset.py:1357-1388`` test / ``:156-190`` train)."""
    out = []
    for s in _load_json(annotation_json):
        rec = {
            "vid": s.get("video_id"),
            "qid": s.get("question_id"),
            "question_type": s.get("type"),
            "video_path": s["video_path"],
            "audio_path": s["audio_path"],
            "question": s.get("question", ""),
        }
        if "answer" in s:
            rec["answer"] = s["answer"]
        out.append(rec)
    return out


def ave_split(annotation_json: str, data_root: str) -> List[Dict]:
    """AVE: audio_data/<vid>.mp3 + AVE/<vid>.mp4
    (``unified_dataset.py:1389-1412``)."""
    out = []
    for s in _load_json(annotation_json):
        vid = s["vid"]
        out.append(
            {
                "vid": vid,
                "audio_path": join(data_root, "audio_data", vid + ".mp3"),
                "video_path": join(data_root, "AVE", vid + ".mp4"),
                "event": s.get("event"),
                "start_time": s.get("start_time"),
                "end_time": s.get("end_time"),
            }
        )
    return out


def avvp_split(annotation_json: str, data_root: str) -> List[Dict]:
    """AVVP/LLP: audio_data/<vid>.mp3 + llp_videos/<vid>.mp4
    (``unified_dataset.py:1414-1439``)."""
    out = []
    for s in _load_json(annotation_json):
        vid = s["vid"]
        rec = {
            "vid": vid,
            "audio_path": join(data_root, "audio_data", vid + ".mp3"),
            "video_path": join(data_root, "llp_videos", vid + ".mp4"),
        }
        if s.get("label") is not None:
            rec["label"] = s["label"]
        if s.get("event") is not None:
            rec["event"] = s["event"]
        out.append(rec)
    return out


def _avs_frames(avs_root: str, sub: str, uid: str, n: int, labels_dir: str):
    frames = [join(avs_root, sub, uid, "frames", f"{i}.jpg") for i in range(n)]
    masks = [join(avs_root, sub, uid, labels_dir, f"{i}.png") for i in range(n)]
    return frames, masks


def ms3_split(avs_root: str, split: str = "test") -> List[Dict]:
    """AVSBench v1m: per-frame records, 5 frames/clip
    (``unified_dataset.py:1442-1511`` test / ``:268-322`` train)."""
    out = []
    for s in _load_json(join(avs_root, "ms3_samples.json")):
        if s["split"] != split:
            continue
        uid = s["uid"]
        frames, masks = _avs_frames(avs_root, "v1m", uid, 5, "labels_semantic")
        for i in range(5):
            out.append(
                {
                    "vid": s.get("vid"),
                    "uid": uid,
                    "audio_path": join(avs_root, "v1m", uid, "audio.wav"),
                    "image_path_list": frames,
                    "image_path": frames[i],
                    "mask_path": masks[i],
                    "object": s.get("a_obj"),
                    "idx": i,
                    "total_seconds": 5,
                }
            )
    return out


def s4_split(avs_root: str, split: str = "test") -> List[Dict]:
    """AVSBench v1s (``unified_dataset.py:1514-1553`` test / ``:326-363``
    train). The reference trains on frame 0 only but evaluates all 5."""
    out = []
    for s in _load_json(join(avs_root, "s4_samples.json")):
        if s["split"] != split:
            continue
        uid = s["uid"]
        frames, masks = _avs_frames(avs_root, "v1s", uid, 5, "labels_semantic")
        idxs = range(5) if split == "test" else (0,)
        for i in idxs:
            out.append(
                {
                    "vid": s.get("vid"),
                    "uid": uid,
                    "audio_path": join(avs_root, "v1s", uid, "audio.wav"),
                    "image_path_list": frames,
                    "image_path": frames[i],
                    "mask_path": masks[i],
                    "object": s.get("a_obj"),
                    "idx": i,
                    "total_seconds": 5,
                }
            )
    return out


def avss_split(avs_root: str, split: str = "test", train_frame: int = None) -> List[Dict]:
    """AVSBench v2 semantic: 10 frames, RGB-palette labels
    (``unified_dataset.py:1556-1612`` test / ``:365-448`` train — the
    train builder picks ONE random frame per clip; pass ``train_frame``
    or pre-shuffle outside for that behavior)."""
    import random as _random

    out = []
    rng = _random.Random(0)
    for s in _load_json(join(avs_root, "avss_samples.json")):
        if s["split"] != split:
            continue
        uid = s["uid"]
        frames, masks = _avs_frames(avs_root, "v2", uid, 10, "labels_rgb")
        if split == "train":
            idxs = [train_frame if train_frame is not None else rng.randint(0, 9)]
        else:
            idxs = range(10)
        for i in idxs:
            out.append(
                {
                    "vid": s.get("vid"),
                    "uid": uid,
                    "audio_path": join(avs_root, "v2", uid, "audio.wav"),
                    "image_path_list": frames,
                    "image_path": frames[i],
                    "mask_path": masks[i],
                    "object": s.get("a_obj"),
                    "idx": i,
                }
            )
    return out


def ref_avs_split(refavs_root: str, split: str = "test_s") -> List[Dict]:
    """Ref-AVS: metadata.csv rows (vid, uid, split, fid, exp); media under
    media/<vid>/, masks under gt_mask/<vid>/fid_<fid>/0000<i>.png
    (``unified_dataset.py:1712-1747`` test / ``:611-680`` train).
    split: train | test_s | test_u | test_n."""
    import random as _random

    rng = _random.Random(0)
    out = []
    with open(join(refavs_root, "metadata.csv")) as f:
        for row in csv.reader(f):
            vid_raw, uid, row_split, fid, exp = row[:5]
            if row_split != split:
                continue
            vid = uid.rsplit("_", 2)[0]
            obj = uid.rsplit("_", 2)[1]
            frames = [
                join(refavs_root, "media", vid, "frames", f"{i}.jpg")
                for i in range(10)
            ]
            idxs = [rng.randint(0, 9)] if split == "train" else range(10)
            for i in idxs:
                out.append(
                    {
                        "vid": vid,
                        "uid": uid,
                        "fid": fid,
                        "exp": exp,
                        "object": obj,
                        "audio_path": join(refavs_root, "media", vid, "audio.wav"),
                        "image_path_list": frames,
                        "image_path": frames[i],
                        "mask_path": join(
                            refavs_root, "gt_mask", vid, f"fid_{fid}", f"0000{i}.png"
                        ),
                        "idx": i,
                        "null": split == "test_n",
                    }
                )
    return out


def arig_split(avs_root: str, split: str = "test") -> List[Dict]:
    """ARIG from v1s grounding annotations; drops the x1==1000
    no-sounding-object sentinel rows (``unified_dataset.py:1615-1661``
    test / ``:496-583`` train)."""
    out = []
    for s in _load_json(join(avs_root, "v1s_grounding_samples.json")):
        if s["split"] != split:
            continue
        x1, y1 = s["top_left"]
        x2, y2 = s["bottom_right"]
        if x1 == 1000:
            continue
        frame_path = s["frame_path"]
        idx = int(os.path.basename(frame_path).split(".")[0])
        out.append(
            {
                "audio_path": s["audio_path"],
                "image_path": frame_path,
                "mask_path": s.get("mask_path"),
                "object": s.get("a_obj"),
                "box": [x1, y1, x2, y2],
                "gt_box": [x1, y1, x2, y2],
                "idx": idx,
                "tot": 5,
            }
        )
    return out


def avcap_split(valor_root: str, split: str = "val") -> List[Dict]:
    """VALOR captioning: video_data/<id>.mp4 + audio_data/<id>.mp3
    (``unified_dataset.py:1687-1709`` test / ``:586-609`` train)."""
    name = {"val": "val_samples.json", "train": "train_samples.json"}[split]
    out = []
    for s in _load_json(join(valor_root, name)):
        vid = s["video_id"]
        out.append(
            {
                "vid": vid,
                "video_path": join(valor_root, "video_data", vid + ".mp4"),
                "audio_path": join(valor_root, "audio_data", vid + ".mp3"),
                "caption": s.get("desc", ""),
            }
        )
    return out


SPLIT_BUILDERS = {
    "avqa": avqa_split,
    "ave": ave_split,
    "avvp": avvp_split,
    "ms3": ms3_split,
    "s4": s4_split,
    "avss": avss_split,
    "ref-avs": ref_avs_split,
    "arig": arig_split,
    "avcap": avcap_split,
}
