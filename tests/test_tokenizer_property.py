"""Property-based round-trip for the dump value tokenizer.

The reference's tokenizer (sync.py:121-158) was verified by probe inputs
only; hypothesis lets us state the actual contract: ANY list of values,
rendered as a SQL VALUES clause, tokenizes back to exactly those values —
including quotes, doubled-quote escapes, backslash escapes, parens,
commas, semicolons, and NULLs (the reference's regex fails on ``)`` in
strings, SURVEY §1.2; this proves we don't).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from database_syncer_spark.sources.dump import tokenize_insert_rows

# Values a dump can carry: NULL, integer/decimal literals, or strings over
# a hostile alphabet (quote chars, backslash, parens, commas, semicolons).
_text = st.text(
    alphabet=st.sampled_from(list("ab'\\(),;\" \t0")), max_size=12)
_value = st.one_of(
    st.none(),
    st.integers(min_value=-10**9, max_value=10**9).map(str),
    st.decimals(allow_nan=False, allow_infinity=False, places=2).map(str),
    _text,
)
_row = st.lists(_value, min_size=1, max_size=6)
_rows = st.lists(_row, min_size=1, max_size=5)


def _render_value(v: str | None) -> str:
    if v is None:
        return "NULL"
    # numeric literals pass through unquoted — but only exact ones: SQL
    # whitespace around a bare literal is not value content, so anything
    # with surrounding whitespace must be rendered as a quoted string
    if v == v.strip():
        try:
            float(v)
            return v
        except ValueError:
            pass
    # standard SQL string: double the quotes, double the backslashes
    return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"


def _render(rows: list[list[str | None]]) -> str:
    return ",".join(
        "(" + ", ".join(_render_value(v) for v in row) + ")" for row in rows
    )


@settings(max_examples=500, deadline=None)
@given(_rows)
def test_tokenize_roundtrips_any_values(rows):
    # rows must be rectangular like a real INSERT? No — the tokenizer
    # is shape-agnostic; downstream length checks enforce arity.
    assert tokenize_insert_rows(_render(rows)) == rows


@settings(max_examples=200, deadline=None)
@given(_rows)
def test_tokenize_ignores_surrounding_sql(rows):
    """Leading/trailing SQL noise outside parens must not change parsing."""
    clause = _render(rows)
    assert tokenize_insert_rows(clause + " ;") == rows


@settings(max_examples=500, deadline=None)
@given(_rows)
def test_fast_path_equivalent_to_scanner(rows):
    """The regex fast path, when it accepts an input, must agree exactly
    with the char scanner; on rendered well-formed input it must accept."""
    from database_syncer_spark.sources.dump import _tokenize_fast, _tokenize_scan

    clause = _render(rows)
    fast = _tokenize_fast(clause)
    assert fast is not None, "fast path rejected well-formed input"
    assert fast == _tokenize_scan(clause) == rows


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab'\\(),;\" \t0NUL")), max_size=40))
def test_fast_path_never_disagrees_on_arbitrary_text(s):
    """On ARBITRARY garbage the fast path may bail (None) but must never
    return something different from the scanner."""
    from database_syncer_spark.sources.dump import _tokenize_fast, _tokenize_scan

    fast = _tokenize_fast(s)
    if fast is not None:
        assert fast == _tokenize_scan(s)
