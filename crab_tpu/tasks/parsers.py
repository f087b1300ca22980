"""Output-text parsers for eval (offline-scoring helpers).

The reference dumps raw decoded text to JSONL and scores offline; these
parsers extract the structured pieces its answer templates contain.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple


def extract_tag(text: str, tag: str) -> Optional[str]:
    """<tag>...</tag> content, e.g. <answer>, <event>, <range>."""
    m = re.search(rf"<{tag}>(.*?)</{tag}>", text, re.DOTALL)
    return m.group(1).strip() if m else None


_BOX_RE = re.compile(
    r"\(\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*\)"
)


def parse_box(text: str) -> Optional[Tuple[float, float, float, float]]:
    """ARIG: 'coordinate of top left corner is (x1,y1) and ... (x2,y2)'
    or '<obj>(x1,y1)(x2,y2)</obj>' -> (xmin, ymin, xmax, ymax)."""
    pts = _BOX_RE.findall(text)
    if len(pts) < 2:
        return None
    (x1, y1), (x2, y2) = pts[0], pts[1]
    return (float(x1), float(y1), float(x2), float(y2))


def parse_events(text: str) -> List[Tuple[str, Optional[str]]]:
    """AVE/AVVP: pairs of <event>..</event> with optional following
    <range>..</range> / <visual_event>/<audio_event> variants."""
    events = []
    for m in re.finditer(
        r"<(event|visual_event|audio_event)>(.*?)</\1>(?:\s*<range>(.*?)</range>)?",
        text,
        re.DOTALL,
    ):
        events.append((m.group(2).strip(), m.group(3).strip() if m.group(3) else None))
    return events


def parse_time_range(text: str) -> Optional[Tuple[float, float]]:
    nums = re.findall(r"(-?\d+(?:\.\d+)?)", text)
    if len(nums) >= 2:
        return float(nums[0]), float(nums[1])
    return None


def normalize_answer(text: str) -> str:
    """AVQA accuracy is a string match on the answer span; fall back to the
    full decode if no <answer> tag is present."""
    ans = extract_tag(text, "answer")
    if ans is None:
        ans = text
    return ans.strip().strip(".").lower()
