"""Round-7 crash-safety pins for the letter_files two-phase-commit sink
(sources/pyds.py) — the UNHAPPY paths the round-trip tests don't reach:
a task abort between stage and publish, an epoch replayed after a crash,
and the overwrite crash window where two complete job file sets coexist
(disambiguated by the new _SUCCESS commit manifest).

Unit-level on the writer objects on purpose: a crash "between phases" is a
precise instant no end-to-end Spark run can stop at deterministically, but
the writer protocol is plain Python — staging and commit messages are
constructed exactly as _stage_rows builds them, and every assertion is on
the real on-disk layout readers see.
"""

import json
import os
import uuid

from mapreduce_model_spark.sources.pyds import (
    LetterFilesStreamWriter,
    LetterFilesWriter,
    _StagedFiles,
    published_part_files,
)


def _stage(out: str, letter: str, lines: list[str], pid: int = 0) -> _StagedFiles:
    """Stage one task's output exactly like _stage_rows: a per-attempt
    uuid-named file under <out>/_staging plus the commit-message triple."""
    staging = os.path.join(out, "_staging")
    os.makedirs(staging, exist_ok=True)
    staged = os.path.join(staging, f"{uuid.uuid4().hex}-{letter}.txt")
    with open(staged, "w", encoding="utf-8") as fh:
        fh.write("".join(ln + "\n" for ln in lines))
    return _StagedFiles(pairs=[(staged, letter, pid)])


def _visible(out: str) -> dict[str, list[str]]:
    """letter -> concatenated lines of the COMMITTED view."""
    got: dict[str, list[str]] = {}
    for f in published_part_files(out):
        letter = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
        with open(f, encoding="utf-8") as fh:
            got.setdefault(letter, []).extend(fh.read().splitlines())
    return got


def _raw_parts(out: str) -> list[str]:
    parts = []
    for entry in sorted(os.listdir(out)):
        if entry.startswith("letter="):
            parts += sorted(os.listdir(os.path.join(out, entry)))
    return parts


def test_stream_epoch_abort_then_retry_lands_exactly_once(tmp_path):
    """Inject a failure between stage and publish within an epoch: nothing
    may be visible (staged-only output is invisible by construction, and
    abort removes the residue); the RETRIED epoch must land its files
    exactly once; a checkpoint REPLAY of the same epoch must republish
    onto the same names — one copy per (epoch, task), byte-stable."""
    out = str(tmp_path / "stream")
    w = LetterFilesStreamWriter({"path": out})

    # epoch 0, attempt 1: staged, then the job dies before commit()
    m1 = _stage(out, "a", ["apple:1", "ant:2"])
    assert not [e for e in os.listdir(out) if e.startswith("letter=")]
    w.abort([m1], 0)
    assert not os.path.exists(m1.pairs[0][0]), "abort left staged residue"

    # epoch 0 retried: fresh attempt, commit publishes exactly once
    m2 = _stage(out, "a", ["apple:1", "ant:2"])
    w.commit([m2], 0)
    assert _visible(out) == {"a": ["apple:1", "ant:2"]}
    assert _raw_parts(out) == ["epoch-0000000000-part-00000.txt"]
    assert not os.listdir(os.path.join(out, "_staging")) if os.path.isdir(
        os.path.join(out, "_staging")
    ) else True

    # epoch 0 REPLAYED after a post-commit crash (checkpointed offsets
    # re-run the same batchId): republish lands on the SAME name
    m3 = _stage(out, "a", ["apple:1", "ant:2"])
    w.commit([m3], 0)
    assert _raw_parts(out) == ["epoch-0000000000-part-00000.txt"]
    assert _visible(out) == {"a": ["apple:1", "ant:2"]}


def test_batch_job_abort_publishes_nothing(tmp_path):
    """A failed batch JOB publishes nothing: abort() discards staging and
    no letter= directory ever appears."""
    out = str(tmp_path / "batch")
    w = LetterFilesWriter({"path": out}, overwrite=True)
    m = _stage(out, "b", ["bear:3"])
    w.abort([m])
    assert not os.path.isdir(os.path.join(out, "_staging"))
    assert not os.path.isdir(out) or not [
        e for e in os.listdir(out) if e.startswith("letter=")
    ]


def test_overwrite_crash_window_reads_one_dataset(tmp_path):
    """The overwrite crash window: job B crashes after publishing its part
    files but BEFORE flipping the manifest — both complete file sets are
    on disk, and manifest-aware readers must still see exactly job A's
    dataset. After B is retried to completion, exactly B's dataset — and
    zombie files from any dead job id stay invisible."""
    out = str(tmp_path / "ow")

    wa = LetterFilesWriter({"path": out}, overwrite=True)
    wa.commit([_stage(out, "a", ["apple:1"])])
    assert _visible(out) == {"a": ["apple:1"]}
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["job_ids"] == [wa.job_id]

    # job B: publish phase only (the exact crash instant — files renamed
    # into the final layout with B's job id, manifest never flipped)
    wb = LetterFilesWriter({"path": out}, overwrite=True)
    staged = _stage(out, "a", ["avocado:9"]).pairs[0][0]
    final_b = os.path.join(out, "letter=a", f"part-00000-{wb.job_id}.txt")
    os.replace(staged, final_b)
    assert len(_raw_parts(out)) == 2, "both job file sets should coexist"
    assert _visible(out) == {"a": ["apple:1"]}, (
        "reader must keep seeing job A until the manifest flips"
    )

    # job B retried end-to-end: manifest flips, A (and B's dead attempt)
    # retired, reader sees exactly the new dataset
    wb2 = LetterFilesWriter({"path": out}, overwrite=True)
    wb2.commit([_stage(out, "a", ["avocado:9"])])
    assert _visible(out) == {"a": ["avocado:9"]}
    assert _raw_parts(out) == [f"part-00000-{wb2.job_id}.txt"]

    # a zombie from a dead job id reappearing (e.g. a delayed NFS rename)
    # stays invisible to manifest-aware readers
    zombie = os.path.join(out, "letter=a", "part-00007-deadbeef0000.txt")
    with open(zombie, "w", encoding="utf-8") as fh:
        fh.write("zombie:0\n")
    assert _visible(out) == {"a": ["avocado:9"]}


def test_append_manifest_accretes_job_ids(tmp_path):
    """mode('append'): each job ADDS its id to the live set — the reader's
    view is the union of all committed jobs, and ids of a pre-manifest
    sink are recovered from the part names."""
    out = str(tmp_path / "ap")
    w1 = LetterFilesWriter({"path": out}, overwrite=False)
    w1.commit([_stage(out, "c", ["cat:1"])])
    # simulate a pre-manifest sink: drop the manifest, append again
    os.remove(os.path.join(out, "_SUCCESS"))
    w2 = LetterFilesWriter({"path": out}, overwrite=False)
    w2.commit([_stage(out, "c", ["cow:2"], pid=1)])
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["job_ids"] == sorted([w1.job_id, w2.job_id])
    assert _visible(out) == {"c": ["cat:1", "cow:2"]}


def test_concurrent_appends_union_job_ids(tmp_path):
    """Two appends racing at commit: each constructs its writer (and reads
    the manifest) before the other commits. The second commit must union
    the ids recoverable from published part names, not just the manifest
    it read — otherwise the first job's committed files silently drop out
    of the manifest-aware view (ADVICE r7)."""
    out = str(tmp_path / "race")
    w1 = LetterFilesWriter({"path": out}, overwrite=False)
    w2 = LetterFilesWriter({"path": out}, overwrite=False)
    # w1 frozen mid-commit: part file published, manifest not yet written
    # (the instant a racing w2 commit can observe)
    s1 = _stage(out, "d", ["dog:1"]).pairs[0][0]
    final_1 = os.path.join(out, "letter=d", f"part-00000-{w1.job_id}.txt")
    os.makedirs(os.path.dirname(final_1), exist_ok=True)
    os.replace(s1, final_1)
    w2.commit([_stage(out, "d", ["deer:2"], pid=1)])
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["job_ids"] == sorted([w1.job_id, w2.job_id])
    assert _visible(out) == {"d": ["dog:1", "deer:2"]}


def test_published_parts_job_id_parsed_exactly(tmp_path):
    """The reader matches the job-id FIELD of part-<pid>-<job>.txt, not a
    substring: a live job id appearing inside another file's pid or a
    longer dead id must not make that file visible (ADVICE r7)."""
    out = str(tmp_path / "exact")
    w = LetterFilesWriter({"path": out}, overwrite=True)
    w.commit([_stage(out, "e", ["elk:3"])])
    d = os.path.join(out, "letter=e")
    # dead job whose id CONTAINS the live id as a substring
    with open(os.path.join(d, f"part-00009-zz{w.job_id}.txt"), "w") as fh:
        fh.write("eel:9\n")
    # malformed name (extra dash field) carrying the live id
    with open(os.path.join(d, f"part-00008-{w.job_id}-x.txt"), "w") as fh:
        fh.write("emu:8\n")
    assert _visible(out) == {"e": ["elk:3"]}
