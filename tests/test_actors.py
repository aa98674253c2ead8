"""Actor-metadata extraction tests (metadata.py:137-401): per-type
sections, validity gate, said/quote seen-dict, max-confidence dedup,
sha1 entity ids, and a Spark-vs-kernel differential."""

from __future__ import annotations

import hashlib

from neuronews_spark.operators.actors import (
    entity_id_py,
    extract_actors,
    extract_actors_py,
    valid_name_py,
)

NEWS = (
    'Omar Hart said the plan works. "it is working well", Jane Doe noted. '
    "Acme Data Group expanded operations. THE board met"
)
TRANSCRIPT = "ANNA REY: we will start now\nBob Lim: agreed on the plan"
BOOK = "NARRATOR: in the beginning\nJOHN DOE: hello there"
PAPER = "the methods at Stanford University hold and results from Oxford Institute agree"


def test_valid_name_gate():
    assert valid_name_py("Jane Doe") and valid_name_py("IBM")
    assert not valid_name_py("the")        # skip word
    assert not valid_name_py("x")          # too short
    assert not valid_name_py("lower case")  # first word not capitalised
    assert valid_name_py("3M Corp")        # acronym-ish first word (isupper)


def test_entity_id_is_sha1_of_collapsed_name():
    assert entity_id_py("  Jane   Doe ") == "ent-" + hashlib.sha1(
        b"jane doe"
    ).hexdigest()[:12]


def test_news_sections_and_seen_dict():
    out = extract_actors_py(
        1, "news", NEWS, authors=["Pat Lee"], source_id="Daily Sun"
    )
    # said-pattern finds both speakers (the quoted form also matches the
    # said pattern first, so the 0.78 quote record never lands)
    assert out[("omar hart", "speaker")] == ("Omar Hart", 0.72)
    assert out[("jane doe", "speaker")] == ("Jane Doe", 0.72)
    assert out[("acme data group", "subject")] == ("Acme Data Group", 0.65)
    assert out[("daily sun", "subject")] == ("Daily Sun", 0.90)
    assert out[("pat lee", "author")] == ("Pat Lee", 0.95)
    # "THE board met" — 'THE' is a skip word even as an acronym
    assert ("the", "speaker") not in out and ("the board", "subject") not in out


def test_transcript_and_book_speakers():
    t = extract_actors_py(2, "transcript", TRANSCRIPT, speakers=["Omar Hart"])
    assert t[("omar hart", "speaker")] == ("Omar Hart", 0.90)
    assert t[("anna rey", "speaker")] == ("ANNA REY", 0.80)
    assert t[("bob lim", "speaker")] == ("Bob Lim", 0.80)
    b = extract_actors_py(3, "book", BOOK, publisher="West Press")
    assert b[("narrator", "speaker")] == ("Narrator", 0.75)
    assert b[("john doe", "speaker")] == ("John Doe", 0.75)
    assert b[("west press", "subject")] == ("West Press", 0.88)


def test_dedup_keeps_max_confidence():
    # transcript: diarized (0.90) and body label (0.80) for the same name
    out = extract_actors_py(
        4, "transcript", "Omar Hart: taking over now and more words", speakers=["Omar Hart"]
    )
    assert out[("omar hart", "speaker")] == ("Omar Hart", 0.90)


def test_spark_matches_kernel(spark):
    rows = [
        (1, "news", NEWS, ["Pat Lee", "Kim Cho"], "Daily Sun", None, None, None),
        (2, "web", NEWS, ["Pat Lee"], "sun", None, None, None),  # invalid outlet
        (3, "paper", PAPER, ["Ada Lovelace"], None, "Nature Press", None, None),
        (4, "transcript", TRANSCRIPT, [], None, None, None, ["Omar Hart"]),
        (5, "book", BOOK, ["May Writer"], None, "West Press", None, None),
        (6, "note", "content without names", [], None, None, "Dana Cole", None),
        (7, "blog", "nothing here at all", [], None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, source_type string, content string, authors array<string>, "
        "source_id string, publisher string, creator string, speakers array<string>",
    )
    got = {}
    for r in extract_actors(
        df,
        authors_col="authors",
        source_id_col="source_id",
        publisher_col="publisher",
        creator_col="creator",
        speakers_col="speakers",
    ).collect():
        got[(r["document_id"], r["actor_name"].lower(), r["role"])] = (
            r["actor_name"],
            r["confidence"],
            r["entity_id"],
        )
    expected = {}
    for doc_id, st, content, authors, sid, pub, cre, spk in rows:
        for (k, role), (name, conf) in extract_actors_py(
            doc_id, st, content, authors, sid, pub, cre, spk
        ).items():
            expected[(doc_id, k, role)] = (name, conf, entity_id_py(name))
    assert got == expected and len(expected) >= 12
