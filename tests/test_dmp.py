"""F17: real diff-match-patch application — patch text parsing, fuzzy
matching, and the ordered body-edit fold over genuine ``@@`` patches
(reference: processors/comment_processor_for_engine.py:102-130)."""

from __future__ import annotations

import pytest

from distribution_engine_smt_spark.functions.dmp import apply_body_edit, fold_body_edits
from distribution_engine_smt_spark.functions.dmp_core import (
    DELETE,
    EQUAL,
    INSERT,
    Patch,
    match_main,
    patch_apply,
    patch_from_text,
    patch_to_text,
)


def test_patch_parse_and_exact_apply():
    src = "The quick brown fox jumped over the lazy dog."
    pt = "@@ -17,15 +17,15 @@\n fox \n-jumped\n+leaped\n  over\n"
    patches = patch_from_text(pt)
    assert len(patches) == 1 and len(patches[0].diffs) == 4
    out, results = patch_apply(patches, src)
    assert out == "The quick brown fox leaped over the lazy dog."
    assert results == [True]


def test_patch_fuzzy_apply_shifted_and_mutated_base():
    # base drifted since the patch was made: prefix added, 'the'->'a'
    pt = "@@ -17,15 +17,15 @@\n fox \n-jumped\n+leaped\n  over\n"
    out, results = patch_apply(
        patch_from_text(pt), "AA The quick brown fox jumped over a lazy dog."
    )
    assert results == [True] and "fox leaped over" in out


def test_patch_at_string_edges_uses_null_padding():
    out, r = patch_apply(patch_from_text("@@ -1,8 +1,8 @@\n-Hello\n+Howdy\n  wo\n"), "Hello world")
    assert (out, r) == ("Howdy world", [True])
    out, r = patch_apply(patch_from_text("@@ -8,4 +8,6 @@\n orl\n-d\n+d!!\n"), "Hello world")
    assert (out, r) == ("Hello world!!", [True])


def test_multi_hunk_patch_applies_in_order():
    src = "alpha beta gamma delta epsilon"
    pt = "@@ -1,8 +1,9 @@\n-alpha\n+ALPHA!\n  be\n@@ -15,10 +16,9 @@\n ma d\n-el\n+E\n ta e\n"
    out, results = patch_apply(patch_from_text(pt), src)
    assert results == [True, True]
    assert out == "ALPHA! beta gamma dEta epsilon"


def test_long_hunk_two_ended_match():
    body = "x" * 10 + "The quick brown fox jumps over the lazy dog again and again" + "y" * 10
    t1 = "The quick brown fox jumps over the lazy dog again and again"
    pt = (
        f"@@ -11,{len(t1)} +11,{len(t1) - 1} @@\n"
        + " " + t1[:20] + "\n-" + t1[20:30] + "\n+REPLACED!\n " + t1[30:] + "\n"
    )
    out, results = patch_apply(patch_from_text(pt), body)
    assert results == [True] and "REPLACED!" in out


def test_unmatched_patch_reports_false_and_leaves_text():
    pt = "@@ -1,20 +1,20 @@\n-zzzzzzzzzzzz\n+yyyyyyyyyyyy\n qqqqqqqq\n"
    out, results = patch_apply(patch_from_text(pt), "completely different text here")
    assert results == [False] and out == "completely different text here"


def test_wire_format_round_trip_unicode():
    p = Patch([(EQUAL, "ab "), (DELETE, "café"), (INSERT, "café +1"), (EQUAL, " cd")])
    p.length1, p.length2 = len("ab café cd"), len("ab café +1 cd")
    text = patch_to_text([p])
    out, results = patch_apply(patch_from_text(text), "ab café cd")
    assert out == "ab café +1 cd" and results == [True]


def test_plain_text_is_not_patch_text():
    with pytest.raises(ValueError):
        patch_from_text("just a normal post body")
    with pytest.raises(ValueError):
        patch_from_text("@@ bogus header @@\n x\n")


def test_match_main_exact_and_fuzzy():
    assert match_main("abcdef", "cde", 2) == 2
    assert match_main("abcdef", "zzz", 0) == -1
    assert match_main("the cat in the hat", "the hxt", 12) != -1  # 1-char error


def test_apply_body_edit_reference_fallback_chain():
    # patch text -> applied; plain text -> full replacement; the per-patch
    # results are ignored exactly like the reference's `new_body, _ =`
    base = "Hello world"
    assert apply_body_edit(base, "@@ -1,8 +1,8 @@\n-Hello\n+Howdy\n  wo\n") == "Howdy world"
    assert apply_body_edit(base, "totally new body") == "totally new body"
    assert apply_body_edit(None, "fresh") == "fresh"


def test_fold_body_edits_applies_real_patch_chain(spark):
    # op 1 creates the body, ops 2..3 arrive as genuine DMP patch text; the
    # fold must produce the hand-computed final body
    rows = [
        ("@a/p", 1, 0, "The quick brown fox jumped over the lazy dog."),
        ("@a/p", 2, 0, "@@ -17,15 +17,15 @@\n fox \n-jumped\n+leaped\n  over\n"),
        ("@a/p", 3, 0, "@@ -1,8 +1,8 @@\n-The\n+One\n  quic\n"),
        ("@b/q", 1, 0, "unrelated"),
    ]
    df = spark.createDataFrame(
        rows, "authorperm string, block_num long, op_seq int, body string"
    )
    got = {r["authorperm"]: r["body"] for r in fold_body_edits(df).collect()}
    assert got["@a/p"] == "One quick brown fox leaped over the lazy dog."
    assert got["@b/q"] == "unrelated"


def test_rejected_long_hunk_keeps_single_drift_delta():
    """Regression (round-3 ADVICE): after a rejected long fuzzy hunk the
    alignment delta must stay start_loc - expected_loc, like the library.
    The old code subtracted (length2-length1) and re-added the drift,
    doubling it — steering the NEXT patch to the wrong of two identical
    targets.  Fixture: doc drifted +200 chars; patch-2's 20-char pattern
    occurs at +200 (correct) and at +460 (where the doubled delta of the
    buggy code pointed)."""
    from urllib.parse import quote

    from distribution_engine_smt_spark.functions.dmp_core import patch_from_text

    A = "ABCDEFGHIJKLMNOPQRSTUVWXYZ[]{}<>"  # 32-char anchors (two-ended match)
    B = "zyxwvutsrqponmlkjihgfedcba()*&^%"
    M = "m" * 30 + "n" * 30                 # patch-1 source middle
    Mp = "Q" * 65 + "R" * 65                # actual middle: levenshtein 130 > 0.5*124 -> reject
    PAT = "0123456789abcdefghij"
    a_pos, q0, drift = 10, 400, 200
    doc = "." * (drift + a_pos) + A + Mp + B
    doc = doc + "." * ((q0 + 200) - len(doc)) + PAT        # correct target
    doc = doc + "." * ((q0 + 460) - len(doc)) + PAT + "." * 30  # buggy-delta target

    enc = lambda s: quote(s, safe="!~*'();/?:@&=+$,# ")  # noqa: E731
    p1 = f"@@ -{a_pos+1},124 +{a_pos+1},64 @@\n " + enc(A) + "\n-" + enc(M) + "\n " + enc(B) + "\n"
    p2 = (
        f"@@ -{q0+1},20 +{q0+1-60},26 @@\n " + enc(PAT[:10])
        + "\n+" + enc("<MARK>") + "\n " + enc(PAT[10:]) + "\n"
    )
    new, results = patch_apply(patch_from_text(p1 + p2), doc)
    assert results == [False, True]
    assert new.find("<MARK>") == q0 + 200 + 10  # edited the CORRECT occurrence
    assert PAT in new[q0 + 400:]                 # second occurrence untouched


def test_fold_group_ships_by_value(tmp_path):
    """The applyInPandas fold must be loadable WITHOUT this package on
    sys.path (cluster executors don't have /root/repo deployed) — dmp_core
    is registered for by-value pickling."""
    import subprocess
    import sys as _sys

    from pyspark import cloudpickle

    from distribution_engine_smt_spark.functions.dmp import build_fold_group

    blob = tmp_path / "fold.pkl"
    blob.write_bytes(cloudpickle.dumps(build_fold_group()))
    script = tmp_path / "runner.py"
    script.write_text(
        "import sys, pickle, pandas as pd\n"
        "sys.path = [p for p in sys.path if 'repo' not in p and p not in ('', '.')]\n"
        "sys.modules.pop('distribution_engine_smt_spark', None)\n"
        "fold = pickle.load(open(sys.argv[1], 'rb'))\n"
        "pdf = pd.DataFrame({'authorperm': ['@a/p'] * 2, 'block_num': [1, 2],\n"
        "                    'op_seq': [0, 0],\n"
        "                    'body': ['Hello world',\n"
        "                             '@@ -1,8 +1,8 @@\\n-Hello\\n+Howdy\\n  wo\\n']})\n"
        "out = fold(pdf)\n"
        "assert list(out['body']) == ['Howdy world'], out\n"
        "print('OK')\n"
    )
    proc = subprocess.run(
        [_sys.executable, str(script), str(blob)],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert proc.returncode == 0 and "OK" in proc.stdout, proc.stderr


# ---------------------------------------------------------------------------
# differential fuzz vs the real library (round-3 verdict #7): the vendored
# engine's one documented deviation (difflib fine-diff on the fuzzy path,
# dmp_core.py header) is exactly where it could diverge on adversarial
# edits — any container that has diff_match_patch installed proves parity;
# this container doesn't, so the test skips cleanly.
# ---------------------------------------------------------------------------
def test_dmp_differential_fuzz_vs_library():
    import random

    import pytest

    dmp_lib = pytest.importorskip("diff_match_patch")
    from distribution_engine_smt_spark.functions import dmp_core

    dmp = dmp_lib.diff_match_patch()
    rng = random.Random(1234)
    alphabet = "ab cd\nxyz0123"

    def rand_text(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    for trial in range(300):
        base = rand_text(rng.randint(0, 400))
        edited = base
        for _ in range(rng.randint(1, 4)):  # human-scale random edit chain
            i = rng.randint(0, len(edited)) if edited else 0
            j = min(len(edited), i + rng.randint(0, 16))
            edited = edited[:i] + rand_text(rng.randint(0, 16)) + edited[j:]
        patches_text = dmp.patch_toText(dmp.patch_make(base, edited))
        if not patches_text:
            continue
        apply_base = base
        if rng.random() < 0.3 and base:  # drift: exercises the fuzzy path
            k = rng.randint(0, len(base) - 1)
            apply_base = base[:k] + rng.choice(alphabet) + base[k + 1:]
        ours_text, ours_ok = dmp_core.patch_apply(
            dmp_core.patch_from_text(patches_text), apply_base
        )
        lib_text, lib_ok = dmp.patch_apply(dmp.patch_fromText(patches_text), apply_base)
        assert (ours_text, list(ours_ok)) == (lib_text, list(lib_ok)), (
            f"trial {trial}: divergence on drifted={apply_base != base}"
        )
