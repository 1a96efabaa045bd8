"""Generate the golden CSV for the s5_dblp_xml driver query with an
INDEPENDENT parser (xml.etree structural parse), mirroring the reference
reader's matching rules:

- first ATTRIBUTE-LESS occurrence of each secondary tag wins
  (``<author orcid=...>`` never matches — the reference compares the full
  text between '<' and '>' against the tag name);
- missing secondary tags default to ``-missing-``;
- named entities resolve through the DblpCharMapping table.

Usage: python tools/gen_dblp_golden.py
"""

from __future__ import annotations

import csv
import os
import re
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pprl_scaling_framework_spark.sources.dblp_xml import (  # noqa: E402
    _ENTITY_BYTE,
    MISSING_VALUE,
    PRIMARY_TAGS,
    SECONDARY_TAGS,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "dblp_synth.xml")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "dblp_synth.csv")


def _substitute_entities(txt: str) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name in ("amp", "lt", "gt", "quot", "apos"):
            return m.group(0)  # XML predefined; etree handles them
        b = _ENTITY_BYTE.get(name)
        return bytes([b]).decode("iso-8859-1") if b is not None else m.group(0)

    return re.sub(r"&([a-zA-Z]+);", sub, txt)


def main() -> None:
    raw = open(FIXTURE, encoding="iso-8859-1").read()
    txt = _substitute_entities(raw.replace('<!DOCTYPE dblp SYSTEM "dblp.dtd">', ""))
    root = ET.fromstring(txt)
    rows = []
    for el in root:
        if el.tag not in PRIMARY_TAGS or "key" not in el.attrib:
            continue
        rec = [el.get("key")]
        for tag in SECONDARY_TAGS:
            val = MISSING_VALUE
            for child in el:
                if child.tag == tag and not child.attrib:
                    val = child.text or ""
                    break
            rec.append(val)
        rows.append(rec)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["key", "author", "title", "year"])
        w.writerows(rows)
    print(f"golden written: {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
