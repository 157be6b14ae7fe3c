"""File-level tweet-JSON source tests: JSON-lines fixture with malformed
rows, zero-hashtag statuses, and the lowercase contract (FIXTURES.md §B)."""

from __future__ import annotations

import json

from twitter_flink_spark.sources.tweets import parse_statuses, read_status_lines

FIXTURE = [
    {"id": 1, "text": "hello #World", "entities": {"hashtags": [{"text": "World"}]}},
    {"id": 2, "text": "two tags", "entities": {"hashtags": [{"text": "A"}, {"text": "B"}]}},
    {"id": 3, "text": "no hashtags", "entities": {"hashtags": []}},
    {"id": 4, "text": "missing entities"},
]
MALFORMED = ['{"truncated', "plain text", "[]", '{"text": "no id"}']


def test_jsonl_parse_drop_and_lowercase(spark, tmp_path):
    path = tmp_path / "statuses.jsonl"
    lines = [json.dumps(s) for s in FIXTURE] + MALFORMED
    path.write_text("\n".join(lines))

    parsed = parse_statuses(read_status_lines(spark, str(path)))
    rows = {r["status_id"]: r for r in parsed.collect()}

    assert set(rows) == {1, 2, 3, 4}  # all malformed lines dropped
    assert rows[1]["tags"] == ["world"]  # lowercased (TopNHashtags.java:202)
    assert rows[2]["tags"] == ["a", "b"]
    assert rows[3]["tags"] == []  # zero hashtags -> empty array, not null
    assert rows[4]["tags"] == []  # missing entities -> empty array
    assert rows[4]["status_text"] == "missing entities"
