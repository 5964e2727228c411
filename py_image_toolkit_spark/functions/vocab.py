"""Label vocabulary and classifier keyword tables (pure data).

These tables reproduce the reference's labeling dictionaries *as data* —
required for behavioral parity of the E3 field-extraction stage:

- label keyword lists     ≙ reference ocr.py:10-101 (``LABELS``)
- hardcoded address list  ≙ reference ocr.py:138-170
- issuer suffix/keyword sets ≙ reference ocr.py:181-207
- region keywords (neighbor relabel) ≙ reference ocr.py:331-344
- date / rrn / name / address regexes ≙ reference ocr.py:177-254

They are consulted as broadcast literal arrays inside Column expressions
(``F.exists``/``contains``) — a broadcast semi-join of tokens × keywords
(SURVEY.md §2 C5), and by the pure-Python oracle.
"""

from __future__ import annotations

DOC_TITLE_KEYWORDS: tuple[str, ...] = (
    "주민등록증", "문서명", "서류명", "제목", "운전면허증", "공무원증", "여권", "신분증",
)

RRN_LABEL_KEYWORDS: tuple[str, ...] = ("주민등록번호", "주민번호")

ADDRESS_LABEL_KEYWORDS: tuple[str, ...] = ("주소", "거주지", "소재지")

# 29-token hardcoded address keyword list (reference ocr.py:138-170).
ADDRESS_KEYWORDS: tuple[str, ...] = (
    "특별시", "광역시", "도", "시", "군", "구", "읍", "면", "동", "리", "로", "길",
    "번길", "대로", "번지", "아파트", "빌라", "연립", "주택", "맨션", "오피스텔",
    "타워", "빌딩", "주공", "현대", "삼성", "자이", "푸르지오", "더샵", "롯데캐슬",
    "아이파크",
)

ISSUER_SUFFIXES: tuple[str, ...] = (
    "청장", "시장", "경찰서장", "구청장", "교육감", "공단이사장", "총장", "장관",
)

ISSUER_ORG_KEYWORDS: tuple[str, ...] = ("경찰서", "구청", "시청", "도청", "공단", "법원")
ISSUER_ORG_SUFFIXES: tuple[str, ...] = ("청", "서")

# date-guard road keywords (reference ocr.py:218) and address-pass keyword sets
ROAD_KEYWORDS: tuple[str, ...] = ("로", "길", "번길", "대로")
MULTIWORD_ADDRESS_KEYWORDS: tuple[str, ...] = ("로", "길", "동", "호", "번지", "아파트")
CLEAR_ADDRESS_INDICATORS: tuple[str, ...] = ("동", "호", "길", "로", "번지", "층")

# neighbor-relabel region keywords (reference ocr.py:337-340)
REGION_KEYWORDS: tuple[str, ...] = ("특별시", "광역시", "도", "시", "군", "구")

# name-inference veto: token is rejected if ANY of these keywords is a
# substring (``kw == text or kw in text`` — substring subsumes equality;
# verified reference quirk, ocr.py:282-291: 홍길동 is vetoed because "동" and
# "길" are address keywords).
NAME_VETO_KEYWORDS: tuple[str, ...] = (
    DOC_TITLE_KEYWORDS + RRN_LABEL_KEYWORDS + ADDRESS_LABEL_KEYWORDS + ADDRESS_KEYWORDS
)

# anchored regexes (Python fullmatch ≙ ^…$ with rlike; kept ASCII-digit-only
# in both dialects — SURVEY.md §7.4.1)
RRN_DASHED_RE = r"\d{6}\s*-\s*\d{7}"
RRN_PLAIN_RE = r"\d{13}"
YEAR_RE = r"(?:19|20)\d{2}"
MONTH_RE = r"(0?[1-9]|1[0-2])"
DAY_RE = r"(0?[1-9]|[12]\d|3[01])"
NAME_RE = r"^[가-힣]{2,5}$"

# address-shape regexes (reference ocr.py:231-236; `re.search` with ^ anchor
# = prefix match — rlike has search semantics, so identical strings work)
ADDR_UNIT_RE = r"^\d+(?:-\d+)?\s*[가-힣]*[동호층]$"
ADDR_ROAD_RE = r"^[가-힣0-9]+(?:로|길)\s*\d*(?:번길)?(?:[가-힣])?"
ADDR_SUFFIX_RE = r"^[가-힣]+\d*[가-힣]*[동리가로길]$"
ADDR_NUMERIC_RE = r"^\d{3,}-\d{3,}$"

# the six output fields, pivot order (reference ocr.py:349-356)
OUTPUT_FIELDS: tuple[str, ...] = (
    "document_title", "name", "address", "rrn", "issue_date", "issuer",
)
