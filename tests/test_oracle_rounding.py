"""Oracle rounding hygiene — the derived-double ROUND sweep.

r7 post-mortem (strawboat_merge_when): 2-arg ROUND(x, n) is
ENGINE-UNSTABLE when x's shortest decimal repr lands exactly on a half
at digit n+1 — DuckDB rounds the scaled float (x*10^n sits just below
the half -> rounds DOWN) while Spark rounds the BigDecimal of the
shortest repr HALF_UP (-> rounds UP).  Deriving a value by
division/scaling of fixed-decimal data CONCENTRATES results on such
halves (ROUND(price/2, 2): ~half the odd-cent rows), so a gate in that
shape WILL diverge.

Repo convention (the fix): quantize with a SCALE-0 round —
``CAST(ROUND(x * 10^n) AS BIGINT) / 10^n`` — because half-integers of
x*10^n are exactly representable doubles, on which both engines agree
(both round halves away from zero for positives).

This sweep statically scans every registered oracle and flags any
per-row 2-arg ROUND whose argument contains division or scaling.
Auto-exempt (provably or structurally stable):

* aggregate-wrapped arguments (SUM/AVG/list_avg/list_reduce/...):
  rounds once per group on a value both engines agree on to fold-order
  epsilon; divergence needs that single value within epsilon of a
  half — no concentration mechanism, re-observed green every round;
* scale-0 rounds (the convention itself).

Everything else must either use the convention or appear in the
EXEMPT registry below with a written stability argument.
"""

from __future__ import annotations

import re

from strawboat_spark.queries import all_queries

_AGG = re.compile(
    r"\b(SUM|AVG|MIN|MAX|COUNT|VAR_SAMP|VAR_POP|COVAR_SAMP|COVAR_POP|"
    r"STDDEV\w*|MEDIAN|QUANTILE\w*|list_avg|list_reduce|list_aggregate|"
    r"list_sum)\s*\(",
    re.I,
)

# Flagged-but-stable gates, each with the stability argument.  A new
# gate landing here needs the same level of justification — when in
# doubt, use the scale-0 convention instead.
EXEMPT = {
    # duration_sec = n/8000 with n integer: n/8000 = n*125/1e6 is an
    # EXACT 6-decimal multiple, and the round is at 6 decimals — no
    # digits exist below the rounding unit, so every engine/rounding
    # mode maps the double back to the same value.
    # (r9: the wav/flac gates folded into one composite; same argument)
    "multimodal_pcm_audio_decode": "exact 6-decimal multiple rounded at 6",
    # ABS(2-decimal price - integer*1000) is an exact 2-decimal
    # multiple rounded at 2 — same no-sub-unit-digits argument.
    # (r14: the string/date/math batteries folded into one composite;
    # the only non-scale-0 ROUNDs are the math member's, same argument)
    "scalar_funcs_suite": "exact 2-decimal multiple rounded at 2",
    # The '/' the scanner sees lives inside CASE *predicates*; the
    # rounded value is a sum of 0.1-multiples whose accumulated float
    # error (~1e-16) is 13 orders of magnitude below half the rounding
    # unit.
    "text_quality_scores": "division only in predicates; value is 0.1-literal sums",
}


def _round_calls(sql: str):
    """Yield (first_arg, scale_text) for each 2-arg ROUND( in sql."""
    sql = re.sub(r"--[^\n]*", "", sql)  # strip SQL comments
    for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
        i = m.end()
        depth = 1
        buf: list[str] = []
        first = None
        while i < len(sql) and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1 and first is None:
                first = "".join(buf)
                buf = []
                i += 1
                continue
            buf.append(c)
            i += 1
        if first is not None:
            yield first.strip(), "".join(buf).strip()


def test_no_derived_double_round_in_oracles():
    offenders: dict[str, list[str]] = {}
    for name, q in sorted(all_queries().items()):
        if q.oracle is None or name in EXEMPT:
            continue
        for first, scale in _round_calls(q.oracle):
            if scale == "0":
                continue  # scale-0: the convention itself, stable
            if "/" not in first and "*" not in first:
                continue  # no derivation: value carries no new sub-unit digits
            if _AGG.search(first):
                continue  # per-group round of a fold-epsilon-identical value
            offenders.setdefault(name, []).append(f"ROUND({first[:80]}..., {scale})")
    assert not offenders, (
        "per-row 2-arg ROUND over a derived double — engine-unstable on "
        "repr-halves (r7 strawboat_merge_when class). Convert to the "
        f"scale-0 convention or justify in EXEMPT: {offenders}"
    )


def test_exempt_registry_has_no_stale_entries():
    qs = all_queries()
    stale = [n for n in EXEMPT if n not in qs]
    assert not stale, f"EXEMPT names unregistered queries: {stale}"
