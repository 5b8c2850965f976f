"""Expression evaluator parity with the reference's template language.

Cases ported from ``core/dbio/api/api_test.go:148-214`` (render
scenarios: if/now/log-with-nil/coalesce/JSON payloads/typed results) and
``core/dbio/iop/transforms_test.go:1600-1760`` (Check() quote/paren
validation, jmespath literals). No Spark needed — pure driver logic.
"""

import pytest

from sling_cli_spark.expressions import (
    Evaluator, ExpressionError, find_matches, render, search_path,
)


# ------------------------------------------------------------ find_matches

def test_find_matches_basic():
    assert find_matches("a {state.x} b {env.Y}") == ["state.x", "env.Y"]


def test_find_matches_skips_json_keys_but_finds_nested():
    s = '{"filters":{"from":"{state.from_date}"},"limit":{state.limit}}'
    assert find_matches(s) == ["state.from_date", "state.limit"]


def test_find_matches_nested_braces_and_quotes():
    assert find_matches('{if(state.a, "{x}", "b")}') == \
        ['if(state.a, "{x}", "b")']


# ------------------------------------------------------------- search_path

def test_search_path_dots_indexes_star():
    st = {"state": {"items": [{"id": 1}, {"id": 2}]}}
    assert search_path("state.items[-1].id", st) == 2
    assert search_path("state.items[*].id", st) == [1, 2]
    assert search_path("state.missing.deep", st) is None


# ----------------------------------------------------------------- render

@pytest.fixture
def ev():
    return Evaluator(state={
        "env": {"SOME": "yes"},
        "state": {"from_date": "2025-01-01", "limit": 100,
                  "nested": {"name": "John", "age": 42}},
    })


def test_if_function(ev):
    assert ev.render("Result: {if(true, 3, 0)}") == "Result: 3"


def test_now_function_renders_nonempty(ev):
    out = ev.render("Current time: {now()}")
    assert out.startswith("Current time: 20")


def test_log_with_nil_concat(ev):
    # api_test.go: "state.missing = " + state.missing -> "... = nil"
    out = ev.render('Missing: { log("state.missing = " + state.missing) }')
    assert out == "Missing: state.missing = nil"


def test_jmespath_lookup(ev):
    assert ev.render("Name: { state.nested.name }") == "Name: John"


def test_coalesce_env_state_default(ev):
    out = ev.render('{ coalesce(env.START_DATE, state.start_time, "2025-01-01") }')
    assert out == "2025-01-01"


def test_json_payload_with_template_vars(ev):
    s = '{"filters":{"from":"{state.from_date}"},"limit":{state.limit},"sort_order":"asc"}'
    assert ev.render(s) == \
        '{"filters":{"from":"2025-01-01"},"limit":100,"sort_order":"asc"}'


def test_yaml_map_payload_typed_values(ev):
    payload = {"filters": {"from": "{state.from_date}"},
               "limit": "{state.limit}", "sort_order": "asc"}
    out = ev.render(payload)
    assert out == {"filters": {"from": "2025-01-01"},
                   "limit": 100, "sort_order": "asc"}


def test_whole_expression_is_typed(ev):
    assert ev.render("{state.limit}") == 100
    assert ev.render("{state.limit > 50}") is True
    assert ev.render("{int_range(1, 3)}") == [1, 2, 3]


def test_embedded_nil_renders_empty(ev):
    assert ev.render("v={state.nope}!") == "v=!"


def test_unprefixed_span_left_for_runtime_vars(ev):
    # {stream_table} belongs to config.render_vars, not this evaluator
    assert ev.render("s3://b/{stream_table}/{state.limit}") == "s3://b/{stream_table}/100"


def test_operators_and_ternary(ev):
    assert ev.render('{state.limit == 100 ? "big" : "small"}') == "big"
    assert ev.render("{state.limit + 1}") == 101
    assert ev.render('{state.nested.age >= 42 && env.SOME == "yes"}') is True
    assert ev.render('{!(state.limit < 10)}') is True


def test_single_quotes_rejected(ev):
    with pytest.raises(ExpressionError, match="double quotes"):
        ev.render("{state.x == 'abc'}")


def test_jmespath_function_on_arrays(ev):
    ev2 = Evaluator(state={"state": {"arr": [{"id": 1}, {"id": 2}]}})
    assert ev2.render('{jmespath(state.arr, "[-1].id")}') == 2
    assert ev2.render('{jmespath(state.arr, "[0].id")}') == 1


def test_empty_array_jmespath_is_nil():
    ev2 = Evaluator(state={"state": {"arr": []}})
    assert ev2.render('{jmespath(state.arr, "[-1].id")}') is None


def test_keep_missing_leaves_expression():
    # reference semantics (transforms_test.go TestEvaluatorKeepMissingExpr):
    # a span referencing a missing var stays INTACT, it does not render ""
    ev2 = Evaluator(state={}, keep_missing=True)
    assert ev2.render("Value: {state.missing_var}") == \
        "Value: {state.missing_var}"
    # hard failures (unknown function) keep the span instead of raising
    assert ev2.render("X: {whatever_fn(1)}") == "X: {whatever_fn(1)}"
    # without keep_missing, the missing var renders empty
    assert Evaluator(state={}).render("Value: {state.missing_var}") == \
        "Value: "


def test_extras_override(ev):
    assert ev.render("{state.limit}", extras={"state": {"limit": 7}}) == 7


def test_function_census(ev):
    assert ev.render('{length("abcd")}') == 4
    assert ev.render('{upper("ab")}') == "AB"
    assert ev.render('{replace("a-b", "-", "_")}') == "a_b"
    assert ev.render('{join(split("a,b", ","), "|")}') == "a|b"
    assert ev.render('{substring("hello", 1, 3)}') == "el"
    assert ev.render('{int_parse("42")}') == 42
    assert ev.render('{is_null(state.nope)}') is True
    assert ev.render('{is_empty("")}') is True
    assert ev.render('{get(state.nested, "name")}') == "John"
    assert ev.render('{greatest(1, 9, 4)}') == 9
    assert ev.render('{date_format("2025-03-04T05:06:07", "YYYY/MM/DD")}') \
        == "2025/03/04"
    assert ev.render('{date_format(1714608000, "%Y-%m")}') == "2024-05"
    assert ev.render('{encode_base64("hi")}') == "aGk="
    assert ev.render('{decode_base64("aGk=")}') == "hi"
    assert len(ev.render("{uuid()}")) == 36
    assert ev.render('{value(null, 0)}') == 0
    assert ev.render('{coalesce(null, "", "x")}') == "x"
    assert ev.render('{contains("abc", "b")}') is True
    assert ev.render('{sum([1, 2, 3])}') == 6


def test_render_convenience():
    assert render("{state.a}", {"state": {"a": 5}}) == 5


def test_bool_renders_lowercase(ev):
    assert ev.render("ok={state.limit == 100}") == "ok=true"


def test_in_operator(ev):
    assert ev.render('{"a" in ["a", "b"]}') is True
    assert ev.render('{state.limit in [1, 2]}') is False


def test_no_eval_escape_hatches(ev):
    for evil in ('__import__("os")', "[x for x in []]", "lambda: 1",
                 'open("f")'):
        with pytest.raises(ExpressionError):
            ev.evaluate(evil)
    # attribute syntax only navigates the state dict — never live objects
    assert ev.render("{state.__class__}") is None
