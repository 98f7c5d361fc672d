"""SURVEY.md §2 header-count discipline (VERDICT r16 #8): the preamble's
declared operator-row count must equal the actual number of §2 table
rows, so adding rows without bumping the header (or vice versa) fails
CI instead of drifting."""

from __future__ import annotations

import pathlib
import re

_SURVEY = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"

#: §2 operator-row ids: S/P/J/A/W/O/F/T/U + digits, optional b-suffix
#: (A14b, F33b, F38b, F95b).
_ROW = re.compile(r"^\| ((?:S|P|J|A|W|O|F|T|U)\d+b?) \|", re.MULTILINE)


def test_section2_preamble_count_matches_rows():
    text = _SURVEY.read_text()
    m = re.search(r"declares \*\*(\d+) operator rows\*\*", text)
    assert m, "SURVEY.md §2 preamble count sentence missing"
    declared = int(m.group(1))
    # restrict to §2 (stop at §3) so other sections' tables don't count
    sec2 = text[text.index("## 2. Operator inventory"):]
    end = sec2.find("\n## 3")
    if end != -1:
        sec2 = sec2[:end]
    ids = _ROW.findall(sec2)
    assert len(ids) == len(set(ids)), "duplicate operator ids in §2"
    assert len(ids) == declared, (
        f"SURVEY.md §2 declares {declared} rows but contains {len(ids)}"
    )


def test_section2_components_total_is_rows_plus_set_ops():
    text = _SURVEY.read_text()
    rows = int(re.search(r"declares \*\*(\d+) operator rows\*\*", text).group(1))
    total = int(re.search(r"= \*\*(\d+) components\*\*", text).group(1))
    assert total == rows + 1  # + the §2.7 set-operations entry
