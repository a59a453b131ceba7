#!/usr/bin/env python
"""One-shot page validation from the CLI — the standalone-mode analog of
the reference's ``--json '<doc>'`` path (data-quality-server/src/main.rs:
67-88: no server, prints ``JSON OK`` or exits nonzero).

    python scripts/validate_one.py '{"url": "https://h/x", "text": "..." }'

Runs the pinned scalar rule spec on one JSON document shaped like a pages
row (url, warc_ts, html(base64), text, lang); prints the label as JSON and
exits 0 when kept, 2 when dropped, 1 on malformed input.
"""

from __future__ import annotations

import base64
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from data_quality_check_ray.pipelines.reference_rules import label_row


def main() -> int:
    if len(sys.argv) != 2:
        print("usage: validate_one.py '<page json>'", file=sys.stderr)
        return 1
    try:
        row = json.loads(sys.argv[1])
    except ValueError as e:
        print(f"invalid JSON: {e}", file=sys.stderr)
        return 1
    if not isinstance(row, dict):
        print("top-level JSON must be an object", file=sys.stderr)  # lib.rs:253-255 analog
        return 1
    if isinstance(row.get("html"), str):
        row["html"] = base64.b64decode(row["html"])
    row.setdefault("url", None)
    row.setdefault("warc_ts", None)
    row.setdefault("html", None)
    row.setdefault("text", None)
    row.setdefault("lang", None)
    out = label_row(row)
    out["lang_score"] = float(out["lang_score"])
    out["ppl"] = float(out["ppl"])
    print(json.dumps(out))
    return 0 if out["keep"] else 2


if __name__ == "__main__":
    sys.exit(main())
