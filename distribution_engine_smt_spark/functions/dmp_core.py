"""diff-match-patch patch parsing and fuzzy application.

Derived from Neil Fraser's diff-match-patch library
(https://github.com/google/diff-match-patch), Copyright 2018 The
diff-match-patch Authors, licensed under the Apache License, Version 2.0
(http://www.apache.org/licenses/LICENSE-2.0).  The Bitap matcher
(``_match_bitap``) and the ``patch_apply`` alignment loop follow the
library's Python implementation closely — same score function, bin search
bounds, and ``rd`` recurrence — because the engine must byte-match the
library's output on real edit streams; the rest is a reduced
re-implementation of only the entry points the reference engine uses
(``patch_fromText``/``patch_apply``: reference
processors/comment_processor_for_engine.py:102-130).  The library is absent
from this container, hence the vendored-equivalent subset.

Deviations from the library (documented, none change the engine's
behavior on real edit streams):
- The fine-grained diff used ONLY on the fuzzy-apply path (matched region
  differs from the patch's source text) is built with ``difflib`` instead
  of Myers bisect — same (op, text) op-stream contract, equivalent splice
  positions for human-scale edits.
- ``patch_splitMax`` is not applied; patches whose source side exceeds the
  32-char match window use the library's own two-ended match strategy
  (match the first and last 32 chars and take the spanned region).

API (mirrors the library's names used by the reference):
    patch_from_text(text)        -> list[Patch]         (raises ValueError)
    patch_apply(patches, text)   -> (new_text, [bool per patch])
    match_main(text, pattern, loc) -> index | -1
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import quote, unquote

# diff op codes
DELETE, EQUAL, INSERT = -1, 0, 1

MATCH_THRESHOLD = 0.5   # how sloppy a fuzzy match may be (0 = exact)
MATCH_DISTANCE = 1000   # how far from the expected location a match may be
MATCH_MAXBITS = 32      # match window (library: machine word size)
PATCH_DELETE_THRESHOLD = 0.5  # tolerated mismatch when deleting fuzzily

_HEADER = re.compile(r"^@@ -(\d+)(,(\d+))? \+(\d+)(,(\d+))? @@$")


@dataclass
class Patch:
    """One patch hunk: a diff stream plus source/destination coordinates."""

    diffs: list[tuple[int, str]] = field(default_factory=list)
    start1: int = 0
    start2: int = 0
    length1: int = 0
    length2: int = 0

    def __str__(self) -> str:  # library wire format (round-trip aid)
        if self.length1 == 0:
            co1 = f"{self.start1},0"
        elif self.length1 == 1:
            co1 = str(self.start1 + 1)
        else:
            co1 = f"{self.start1 + 1},{self.length1}"
        if self.length2 == 0:
            co2 = f"{self.start2},0"
        elif self.length2 == 1:
            co2 = str(self.start2 + 1)
        else:
            co2 = f"{self.start2 + 1},{self.length2}"
        lines = [f"@@ -{co1} +{co2} @@\n"]
        sign = {DELETE: "-", EQUAL: " ", INSERT: "+"}
        for op, data in self.diffs:
            lines.append(sign[op] + quote(data, safe="!~*'();/?:@&=+$,# ") + "\n")
        return "".join(lines)


def patch_to_text(patches: list[Patch]) -> str:
    return "".join(str(p) for p in patches)


def patch_from_text(text: str) -> list[Patch]:
    """Parse the library's patch wire format. Raises ValueError on malformed
    input — the caller treats that as 'not patch text' (full replacement),
    matching the reference's try/except."""
    patches: list[Patch] = []
    if not text:
        return patches
    lines = text.split("\n")
    i = 0
    while i < len(lines):
        if not lines[i]:
            i += 1
            continue
        m = _HEADER.match(lines[i])
        if not m:
            raise ValueError(f"invalid patch header: {lines[i]!r}")
        p = Patch()
        p.start1 = int(m.group(1))
        if m.group(3) is None:
            p.start1 -= 1
            p.length1 = 1
        else:
            p.length1 = int(m.group(3))
            if p.length1 != 0:
                p.start1 -= 1
        p.start2 = int(m.group(4))
        if m.group(6) is None:
            p.start2 -= 1
            p.length2 = 1
        else:
            p.length2 = int(m.group(6))
            if p.length2 != 0:
                p.start2 -= 1
        i += 1
        while i < len(lines):
            line = lines[i]
            if not line:
                i += 1
                continue
            sign, data = line[0], unquote(line[1:])
            if sign == "@":
                break  # next hunk
            if sign == "-":
                p.diffs.append((DELETE, data))
            elif sign == "+":
                p.diffs.append((INSERT, data))
            elif sign == " ":
                p.diffs.append((EQUAL, data))
            else:
                raise ValueError(f"invalid patch line: {line!r}")
            i += 1
        patches.append(p)
    return patches


# ---------------------------------------------------------------------------
# fuzzy match (Bitap with weighted error + proximity score)
# ---------------------------------------------------------------------------
def _bitap_score(errors: int, location: int, expected: int, pattern_len: int) -> float:
    accuracy = errors / pattern_len
    proximity = abs(expected - location)
    if not MATCH_DISTANCE:
        return 1.0 if proximity else accuracy
    return accuracy + proximity / float(MATCH_DISTANCE)


def _match_bitap(text: str, pattern: str, loc: int) -> int:
    score_threshold = MATCH_THRESHOLD
    # exact hits (forward and backward of loc) pre-tighten the threshold
    best_loc = text.find(pattern, loc)
    if best_loc != -1:
        score_threshold = min(
            _bitap_score(0, best_loc, loc, len(pattern)), score_threshold
        )
        best_loc = text.rfind(pattern, 0, loc + len(pattern))
        if best_loc != -1:
            score_threshold = min(
                _bitap_score(0, best_loc, loc, len(pattern)), score_threshold
            )

    alphabet: dict[str, int] = {}
    for idx, ch in enumerate(pattern):
        alphabet[ch] = alphabet.get(ch, 0) | (1 << (len(pattern) - idx - 1))

    match_mask = 1 << (len(pattern) - 1)
    best_loc = -1
    bin_max = len(pattern) + len(text)
    last_rd: list[int] = []
    for d in range(len(pattern)):  # d = allowed error count
        # binary-search the widest location range that stays under threshold
        bin_min, bin_mid = 0, bin_max
        while bin_min < bin_mid:
            if _bitap_score(d, loc + bin_mid, loc, len(pattern)) <= score_threshold:
                bin_min = bin_mid
            else:
                bin_max = bin_mid
            bin_mid = (bin_max - bin_min) // 2 + bin_min
        bin_max = bin_mid
        start = max(1, loc - bin_mid + 1)
        finish = min(loc + bin_mid, len(text)) + len(pattern)

        rd = [0] * (finish + 2)
        rd[finish + 1] = (1 << d) - 1
        for j in range(finish, start - 1, -1):
            char_match = alphabet.get(text[j - 1], 0) if len(text) > j - 1 else 0
            if d == 0:
                rd[j] = ((rd[j + 1] << 1) | 1) & char_match
            else:
                rd[j] = (((rd[j + 1] << 1) | 1) & char_match) | (
                    ((last_rd[j + 1] | last_rd[j]) << 1) | 1
                ) | last_rd[j + 1]
            if rd[j] & match_mask:
                score = _bitap_score(d, j - 1, loc, len(pattern))
                if score <= score_threshold:
                    score_threshold = score
                    best_loc = j - 1
                    if best_loc > loc:
                        start = max(1, 2 * loc - best_loc)  # keep looking left
                    else:
                        break  # left of loc only gets worse
        if _bitap_score(d + 1, loc, loc, len(pattern)) > score_threshold:
            break  # one more error can't beat the best score
        last_rd = rd
    return best_loc


def match_main(text: str, pattern: str, loc: int) -> int:
    """Locate ``pattern`` in ``text`` near ``loc``: exact first, Bitap after."""
    loc = max(0, min(loc, len(text)))
    if text == pattern:
        return 0
    if not text:
        return -1
    if text[loc:loc + len(pattern)] == pattern:
        return loc
    return _match_bitap(text, pattern, loc)


# ---------------------------------------------------------------------------
# diff helpers for the fuzzy-apply path
# ---------------------------------------------------------------------------
def _diff_texts(diffs: list[tuple[int, str]]) -> tuple[str, str]:
    """(source, destination) text reassembled from a diff stream."""
    t1 = "".join(d for op, d in diffs if op != INSERT)
    t2 = "".join(d for op, d in diffs if op != DELETE)
    return t1, t2


def _diff_main(a: str, b: str) -> list[tuple[int, str]]:
    """Character diff a -> b via difflib (documented deviation)."""
    from difflib import SequenceMatcher

    out: list[tuple[int, str]] = []
    for tag, i1, i2, j1, j2 in SequenceMatcher(None, a, b, autojunk=False).get_opcodes():
        if tag == "equal":
            out.append((EQUAL, a[i1:i2]))
        else:  # replace / delete / insert
            if i2 > i1:
                out.append((DELETE, a[i1:i2]))
            if j2 > j1:
                out.append((INSERT, b[j1:j2]))
    return out


def _diff_levenshtein(diffs: list[tuple[int, str]]) -> int:
    """Edit weight of a diff stream: per contiguous non-equal block,
    max(inserted, deleted) characters."""
    lev = ins = dels = 0
    for op, data in diffs:
        if op == INSERT:
            ins += len(data)
        elif op == DELETE:
            dels += len(data)
        else:
            lev += max(ins, dels)
            ins = dels = 0
    return lev + max(ins, dels)


def _diff_x_index(diffs: list[tuple[int, str]], loc: int) -> int:
    """Translate a source-side index through a diff stream to the
    destination side."""
    chars1 = chars2 = last1 = last2 = 0
    last_op = None
    for op, data in diffs:
        if op != INSERT:
            chars1 += len(data)
        if op != DELETE:
            chars2 += len(data)
        if chars1 > loc:
            last_op = op
            break
        last1, last2 = chars1, chars2
    if last_op == DELETE:
        return last2  # inside a deletion: snap to its start
    return last2 + (loc - last1)


# ---------------------------------------------------------------------------
# patch application
# ---------------------------------------------------------------------------
def _add_padding(patches: list[Patch]) -> str:
    """Pad patch edges with sentinel context so hunks touching the string
    boundaries still match; the caller pads the text with the same string."""
    pad_len = 4
    padding = "".join(chr(x) for x in range(1, pad_len + 1))
    for p in patches:
        p.start1 += pad_len
        p.start2 += pad_len

    first = patches[0]
    if not first.diffs or first.diffs[0][0] != EQUAL:
        first.diffs.insert(0, (EQUAL, padding))
        first.start1 -= pad_len
        first.start2 -= pad_len
        first.length1 += pad_len
        first.length2 += pad_len
    elif pad_len > len(first.diffs[0][1]):
        extra = pad_len - len(first.diffs[0][1])
        first.diffs[0] = (EQUAL, padding[len(first.diffs[0][1]):] + first.diffs[0][1])
        first.start1 -= extra
        first.start2 -= extra
        first.length1 += extra
        first.length2 += extra

    last = patches[-1]
    if not last.diffs or last.diffs[-1][0] != EQUAL:
        last.diffs.append((EQUAL, padding))
        last.length1 += pad_len
        last.length2 += pad_len
    elif pad_len > len(last.diffs[-1][1]):
        extra = pad_len - len(last.diffs[-1][1])
        last.diffs[-1] = (EQUAL, last.diffs[-1][1] + padding[:extra])
        last.length1 += extra
        last.length2 += extra
    return padding


def _copy_patches(patches: list[Patch]) -> list[Patch]:
    return [
        Patch(list(p.diffs), p.start1, p.start2, p.length1, p.length2)
        for p in patches
    ]


def patch_apply(patches: list[Patch], text: str) -> tuple[str, list[bool]]:
    """Apply patches to ``text`` with fuzzy positioning; returns the new text
    and a per-patch success flag (the reference ignores the flags —
    comment_processor_for_engine.py:107)."""
    if not patches:
        return text, []
    patches = _copy_patches(patches)
    null_padding = _add_padding(patches)
    text = null_padding + text + null_padding

    delta = 0
    results: list[bool] = []
    for patch in patches:
        expected_loc = patch.start2 + delta
        text1, text2 = _diff_texts(patch.diffs)
        end_loc = -1
        if len(text1) > MATCH_MAXBITS:
            # two-ended match for long hunks (window-limited fuzzy search)
            start_loc = match_main(text, text1[:MATCH_MAXBITS], expected_loc)
            if start_loc != -1:
                end_loc = match_main(
                    text,
                    text1[-MATCH_MAXBITS:],
                    expected_loc + len(text1) - MATCH_MAXBITS,
                )
                if end_loc == -1 or start_loc >= end_loc:
                    start_loc = -1  # ends matched out of order: give up
        else:
            start_loc = match_main(text, text1, expected_loc)
        if start_loc == -1:
            results.append(False)
            # pretend the patch applied so later coordinates stay aligned
            delta -= patch.length2 - patch.length1
            continue
        results.append(True)
        delta = start_loc - expected_loc
        if end_loc == -1:
            found = text[start_loc:start_loc + len(text1)]
        else:
            found = text[start_loc:end_loc + MATCH_MAXBITS]
        if text1 == found:
            text = text[:start_loc] + text2 + text[start_loc + len(text1):]
            continue
        # imperfect match: diff the patch source against what's actually
        # there, then replay the hunk's edits through that diff's indices
        diffs = _diff_main(text1, found)
        if (
            len(text1) > MATCH_MAXBITS
            and _diff_levenshtein(diffs) / float(len(text1)) > PATCH_DELETE_THRESHOLD
        ):
            # rejected long fuzzy hunk: delta stays start_loc - expected_loc
            # (set above), exactly like the library — adjusting it again here
            # doubled the drift offset for every later patch in the chain
            results[-1] = False
            continue
        index1 = 0
        for op, data in patch.diffs:
            if op != EQUAL:
                index2 = _diff_x_index(diffs, index1)
                if op == INSERT:
                    text = text[:start_loc + index2] + data + text[start_loc + index2:]
                else:  # DELETE
                    end = start_loc + _diff_x_index(diffs, index1 + len(data))
                    text = text[:start_loc + index2] + text[end:]
            # text mutates in place while x-indices describe the original
            # match: advancing on EQUAL+INSERT (but not DELETE) keeps later
            # lookups aligned with the already-edited string
            if op != DELETE:
                index1 += len(data)
    # strip the sentinel padding
    return text[len(null_padding):-len(null_padding)], results
