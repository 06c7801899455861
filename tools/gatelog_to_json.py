#!/usr/bin/env python
"""Convert a check_correctness log into a CORRECTNESS-style JSON artifact.

Usage: python tools/gatelog_to_json.py GATE_LOG OUT_JSON [sf]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log, out = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else None
    pat = re.compile(
        r"^(PASS|FAIL|ROWS)\s+(\S+): (?:(\d+) rows.*?)?\[?([\d.]+)?s?\]?"
    )
    result: dict[str, dict] = {}
    for line in open(log):
        line = line.strip()
        # progress bars share lines with results; keep the result tail
        for tag in ("PASS  ", "FAIL  ", "ROWS  "):
            i = line.find(tag)
            if i >= 0:
                line = line[i:]
                break
        m = re.match(r"^(PASS|FAIL|ROWS)\s+([\w.]+): (.*)$", line)
        if not m:
            continue
        status, name, rest = m.groups()
        rows = re.search(r"(\d+) rows", rest)
        sec = re.search(r"\[([\d.]+)s\]", rest)
        entry: dict = {
            "status": {"PASS": "pass", "FAIL": "fail", "ROWS": "rows_only"}[status],
        }
        if rows:
            entry["rows"] = int(rows.group(1))
        if sec:
            entry["sec"] = float(sec.group(1))
        if status == "FAIL":
            entry["detail"] = rest
        result[name] = entry
    summary = {
        "sf": sf,
        "n_pass": sum(1 for v in result.values() if v["status"] == "pass"),
        "n_fail": sum(1 for v in result.values() if v["status"] == "fail"),
        "n_rows_only": sum(1 for v in result.values() if v["status"] == "rows_only"),
        "queries": result,
    }
    json.dump(summary, open(out, "w"), indent=1)
    print(f"{out}: {summary['n_pass']} pass, {summary['n_fail']} fail, "
          f"{summary['n_rows_only']} rows-only over {len(result)} queries")


if __name__ == "__main__":
    main()
