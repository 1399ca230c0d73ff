"""Vendored snapshot SUBSET of the Public Suffix List (PSL).

Source: the public list maintained at publicsuffix.org (Mozilla, MPL
2.0) — the public, de-facto-standard registrable-domain database every
crawl pipeline (C4, CCNet, ...) keys politeness budgets, blocklists
and per-site stats on. This module vendors a curated ~120-rule subset
of the ICANN section covering the major ccTLD second-level families
plus the canonical wildcard/exception rules, in the list's own line
syntax, so the full file can be swapped in verbatim (same parser, same
schema) for production — the operator and oracle shapes are what this
repo exercises, not list completeness.

Omissions, deliberate:
* plain TLD rules ("com", "uk", ...) — redundant with the PSL default
  rule ``*`` (any unmatched host gets a 1-label public suffix), which
  :func:`rule_rows` consumers implement as the fallback;
* the PRIVATE section (github.io, ...) — registrable-domain grouping
  for crawl policy wants ICANN boundaries;
* low-confidence / frequently-churning entries.

Rule semantics (publicsuffix.org/list/ algorithm):
* a normal rule matches any host that ends with its labels;
* a wildcard rule ``*.ck`` matches hosts with exactly one extra label
  in the ``*`` position (so its public suffix is 1 label longer than
  the parent);
* an exception rule ``!www.ck`` overrides wildcards: the public
  suffix is the rule minus its leftmost label;
* the prevailing rule is the matching exception if any, else the
  LONGEST matching rule, else ``*``;
* the registrable domain is the public suffix plus one more label
  (none when the host IS a public suffix).
"""

from __future__ import annotations

PSL_RULES: tuple[str, ...] = (
    # ---- gTLD second-levels none needed: default '*' covers them ----
    # ---- United Kingdom ----
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # ---- Australia ----
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # ---- Japan (incl. the canonical city wildcard/exception family) ----
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # ---- New Zealand ----
    "ac.nz", "co.nz", "govt.nz", "net.nz", "org.nz", "school.nz",
    # ---- South Africa ----
    "ac.za", "co.za", "edu.za", "gov.za", "net.za", "org.za", "web.za",
    # ---- Brazil ----
    "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    # ---- India ----
    "ac.in", "co.in", "edu.in", "gov.in", "mil.in", "net.in", "org.in",
    "res.in",
    # ---- China / Taiwan / Hong Kong / Singapore ----
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # ---- Indonesia / Thailand / Malaysia / Philippines / Vietnam ----
    "ac.id", "co.id", "go.id", "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "net.th", "or.th",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "ac.vn", "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    # ---- Korea / Israel / Turkey ----
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "com.tr", "edu.tr", "gov.tr", "mil.tr", "net.tr", "org.tr", "web.tr",
    # ---- Mexico / Argentina / Ukraine / Poland ----
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar", "org.ar",
    "com.ua", "edu.ua", "gov.ua", "net.ua", "org.ua",
    "com.pl", "edu.pl", "info.pl", "net.pl", "org.pl",
    # ---- wildcard-only ccTLDs (every 2nd-level is a public suffix) ----
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg",
)


def rule_rows() -> list[tuple[str, int, bool]]:
    """Parse :data:`PSL_RULES` into lookup rows
    ``(suffix_key, ps_len, is_exception)``:

    * normal rule -> key = rule, ps_len = its label count;
    * wildcard ``*.parent`` -> key = parent (one JOIN key matches every
      host under it), ps_len = parent labels + 1 (the ``*`` label);
    * exception ``!rule`` -> key = rule minus the ``!``, ps_len = rule
      labels - 1, is_exception (beats every non-exception match).

    A host matches a row when one of its label-suffixes equals the
    key; the prevailing public-suffix length is the matching
    exception's ps_len if any, else max(ps_len), else 1 (the PSL
    default rule ``*``).
    """
    rows: list[tuple[str, int, bool]] = []
    for rule in PSL_RULES:
        if rule.startswith("!"):
            body = rule[1:]
            rows.append((body, body.count(".") + 1 - 1, True))
        elif rule.startswith("*."):
            parent = rule[2:]
            rows.append((parent, parent.count(".") + 1 + 1, False))
        else:
            rows.append((rule, rule.count(".") + 1, False))
    return rows


#: Deepest JOIN key in the snapshot (and in the full ICANN PSL) has at
#: most this many labels — the number of host label-suffix candidates
#: a lookup must probe. Verified against the vendored rules at import.
MAX_KEY_LABELS = 4
assert all(k.count(".") + 1 <= MAX_KEY_LABELS for k, _, _ in rule_rows())
