"""Generate the committed CSV / JSON-Lines scraped-document fixtures.

The file-batch ingestion surface (``neuronews_spark/sources/files.py``,
re-hosting the reference's ``batch_write_raw_with_lineage.py:88-114``)
needs a registry query whose DuckDB oracle reads the SAME file, so the
fixture must be byte-stable and committed — regenerating this script's
output must be a no-op diff.  Content is fully deterministic (no RNG,
no clock): 30 documents cycling through sources/topics, with commas,
RFC-4180 quoted quotes, unicode, and an empty-text row (filtered by the
query) to exercise the parser paths that matter at ingestion time.

Usage: python scripts/make_file_fixtures.py
"""

from __future__ import annotations

import csv
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(_REPO, "tests", "fixtures")

SOURCES = ["reuters", "bbc", "apnews", "guardian", "aljazeera"]
TOPICS = [
    "central bank policy",
    "semiconductor exports",
    "climate accord",
    "election audit",
    "energy grid",
    "trade tariffs",
]


def rows() -> list[dict]:
    out = []
    for i in range(30):
        source = SOURCES[i % len(SOURCES)]
        topic = TOPICS[i % len(TOPICS)]
        day = (i % 28) + 1
        if i == 17:
            text = ""  # ingestion must tolerate and filter empty bodies
        else:
            # commas, quoted speech, and unicode exercise RFC-4180 quoting
            text = (
                f'officials said the {topic} review, announced on day {day}, '
                f'drew "measured optimism" from analysts at {source} — '
                f"item {i} of the batch."
            )
        out.append(
            {
                "doc_id": 1000 + i,
                "url": f"https://{source}.example.com/{topic.replace(' ', '-')}/{i}",
                "title": f"{topic} update {i}",
                "source": source,
                "published_at": f"2026-07-{day:02d} 0{i % 10}:30:00",
                "text": text,
            }
        )
    return out


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    data = rows()
    cols = list(data[0].keys())
    with open(os.path.join(FIXDIR, "scraped_docs.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)  # RFC-4180: "" escapes quotes
        w.writeheader()
        w.writerows(data)
    with open(os.path.join(FIXDIR, "scraped_docs.json"), "w") as f:
        for r in data:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"wrote {len(data)} rows to {FIXDIR}/scraped_docs.{{csv,json}}")


if __name__ == "__main__":
    main()
