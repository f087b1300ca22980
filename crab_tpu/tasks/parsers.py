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
    """First two non-negative numbers -> (start, end). Times are never
    negative, so '-' is always a separator ('0-4'), not a sign."""
    nums = re.findall(r"(\d+(?:\.\d+)?)", text)
    if len(nums) >= 2:
        return float(nums[0]), float(nums[1])
    return None


# ---------------------------------------------------------------------------
# AVVP: decoded text -> 25-class x 10-second matrices
# ---------------------------------------------------------------------------

# The LLP dataset's 25 event categories (the AVVP benchmark label set;
# the reference scores against 25xT matrices in
# utils/avvp_eval_metrics.py:33-282 but ships neither the class list nor
# the text->matrix step — this is that bridge).
AVVP_CLASSES = (
    "Speech",
    "Car",
    "Cheering",
    "Dog",
    "Cat",
    "Frying_(food)",
    "Basketball_bounce",
    "Fire_alarm",
    "Chainsaw",
    "Cello",
    "Banjo",
    "Singing",
    "Chicken_rooster",
    "Violin_fiddle",
    "Vacuum_cleaner",
    "Baby_laughter",
    "Accordion",
    "Lawn_mower",
    "Motorcycle",
    "Helicopter",
    "Acoustic_guitar",
    "Telephone_bell_ringing",
    "Baby_cry_infant_cry",
    "Blender",
    "Clapping",
)


def normalize_event_name(name: str) -> str:
    """Fold case/punctuation so free-text names match LLP classes:
    'frying (food)' == 'Frying_(food)'."""
    return re.sub(r"[^a-z0-9]", "", name.lower())


_AVVP_INDEX = {normalize_event_name(c): i for i, c in enumerate(AVVP_CLASSES)}


def parse_tagged_events(text: str):
    """All <event>/<audio_event>/<visual_event> spans with their time
    ranges -> [(kind, name, (start, end) | None)]. kind is 'audio',
    'visual' or 'both' (plain <event> counts as audio-visual). The range
    may follow as <range>a-b</range> or as the first two numbers in the
    text before the next event tag ('from 3 to 7 seconds').

    Raw <audio>/<visual> tags are accepted too: AVVP annotation labels
    ship in that form and the reference renames them to *_event only in
    the train builder (``unified_dataset.py:241-245``) — the GT side of
    the offline scorer sees the raw form."""
    out = []
    tags = list(
        re.finditer(
            r"<(event|visual_event|audio_event|audio|visual)>(.*?)</\1>",
            text,
            re.DOTALL,
        )
    )
    for i, m in enumerate(tags):
        kind = {
            "event": "both",
            "visual_event": "visual",
            "audio_event": "audio",
            "visual": "visual",
            "audio": "audio",
        }[m.group(1)]
        name = m.group(2).strip()
        tail = text[m.end(): tags[i + 1].start() if i + 1 < len(tags) else len(text)]
        rng_m = re.search(r"<range>(.*?)</range>", tail, re.DOTALL)
        rng = parse_time_range(rng_m.group(1) if rng_m else tail)
        out.append((kind, name, rng))
    return out


def avvp_text_to_matrices(text: str, seconds: int = 10):
    """Decoded AVVP answer -> (SO_a, SO_v, SO_av) binary (25, seconds)
    matrices for utils/avvp_eval_metrics-style segment/event F1. Events
    whose names don't map to an LLP class are dropped; events without a
    parseable range span the whole clip (the conservative reading of
    'X occurs')."""
    import numpy as np

    a = np.zeros((len(AVVP_CLASSES), seconds), np.float64)
    v = np.zeros((len(AVVP_CLASSES), seconds), np.float64)
    for kind, name, rng in parse_tagged_events(text):
        idx = _AVVP_INDEX.get(normalize_event_name(name))
        if idx is None:
            continue
        if rng is None:
            s, e = 0, seconds
        else:
            s = int(max(min(rng[0], seconds), 0))
            e = int(max(min(round(rng[1]), seconds), 0))
            if e <= s:
                e = min(s + 1, seconds)
        if kind in ("audio", "both"):
            a[idx, s:e] = 1.0
        if kind in ("visual", "both"):
            v[idx, s:e] = 1.0
    return a, v, a * v


def normalize_answer(text: str) -> str:
    """AVQA accuracy is a string match on the answer span; fall back to the
    full decode if no <answer> tag is present."""
    ans = extract_tag(text, "answer")
    if ans is None:
        ans = text
    return ans.strip().strip(".").lower()
