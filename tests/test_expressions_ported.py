"""transforms_test.go Evaluator vectors, ported 1:1.

Source tables (reference: ``core/dbio/iop/transforms_test.go``):

- TestEvaluator                          (:205)  render scenarios
- TestEvaluatorRenderPayload             (:750)  payload recursion
- TestEvaluatorExtractVars               (:1024) var extraction
- TestEvaluatorFillMissingKeys           (:1130) state backfill
- TestEvaluatorCheckExpression           (:1326) quote/paren validation
- TestEvaluatorLiterals                  (:1643) direct Evaluate
- TestEvaluatorKeepMissingExpr           (:1744) keep-intact semantics
- TestEvaluatorAllowNoPrefix             (:1989) bare-identifier vars
- TestEvaluatorExtractVarsWithAllowNoPrefix   (:2260)
- TestEvaluatorFillMissingKeysWithAllowNoPrefix (:2330)
- TestEvaluatorFindMatches               (:2396) span scanning
- TestEvaluatorRenderJmespathJq          (:2597) bracket-heavy strings

Port adaptations (deliberate, each marked at the case):

- Go ``map[any]any`` keys stringify through json.Marshal; the Python
  twin stringifies non-str keys in ``Evaluator.render`` (``123`` ->
  ``"123"``, ``true`` -> ``"true"``).
- ``array_empty[-1].id``: the reference's goval errors on a negative
  index into an empty array; our evaluator resolves pure paths with
  jmespath contract (miss -> None) everywhere, so the case asserts
  None and is marked as a deliberate divergence.
- Go ``nil`` -> ``None``; ``assert.ElementsMatch`` -> sorted compare.
"""

from __future__ import annotations

import pytest

from sling_cli_spark.expressions import Evaluator, ExpressionError

MAIN_PREFIXES = ("state", "store", "env", "run", "target", "source",
                 "stream", "object", "timestamp", "execution", "loop")


def _ev(state, prefixes=MAIN_PREFIXES, **kw):
    return Evaluator(state=state, var_prefixes=prefixes, **kw)


# ------------------------------------------------------------ TestEvaluator

RENDER_CASES = [
    # (name, input, expected, state, extra_state, expect_error)
    ("simple_state_variable", "Hello, {state.name}!", "Hello, World!",
     {"state": {"name": "World"}}, None, False),
    ("environment_variable", "Environment: {env.TEST_VAR}",
     "Environment: test_value", {"env": {"TEST_VAR": "test_value"}},
     None, False),
    ("store_variable", "Stored value: {store.data}",
     "Stored value: stored_data", {"store": {"data": "stored_data"}},
     None, False),
    ("env_and_store_together",
     "Config: {env.MODE} with cache: {store.cache_enabled}",
     "Config: production with cache: true",
     {"env": {"MODE": "production"}, "store": {"cache_enabled": True}},
     None, False),
    ("multiple_variables", "From {env.ORIGIN} to {state.destination}",
     "From Earth to Mars",
     {"env": {"ORIGIN": "Earth"}, "state": {"destination": "Mars"}},
     None, False),
    ("state_override_with_extras", "Value: {state.counter}", "Value: 10",
     {"state": {"counter": 5}}, {"state": {"counter": 10}}, False),
    ("direct_integer_value", "{ state.counter }", 5,
     {"state": {"counter": 5}}, None, False),
    ("direct_boolean_value", "{ state.active }", True,
     {"state": {"active": True}}, None, False),
    ("direct_float_value", "{ state.price }", 19.99,
     {"state": {"price": 19.99}}, None, False),
    ("render_map_value", {"counter": "{ state.counter }"}, {"counter": 5},
     {"state": {"counter": 5}}, None, False),
    ("render_nested_map",
     {"pagination": {"limit": "{ state.limit }",
                     "offset": "{ state.offset }",
                     "limit_str": '{ cast(state.limit, "string") }',
                     "name": "{ env.name }"}},
     {"pagination": {"limit": 10, "offset": 0, "limit_str": "10",
                     "name": "oops"}},
     {"state": {"limit": 10, "offset": 0}, "env": {"name": "oops"}},
     None, False),
    ("render_array", ["{ state.first }", "{ state.second }"],
     ["one", "two"], {"state": {"first": "one", "second": "two"}},
     None, False),
    ("object_serialization", "User: {state.user}",
     'User: {"age":30,"name":"Alice"}',
     {"state": {"user": {"name": "Alice", "age": 30}}}, None, False),
    ("array_serialization", "Items: {state.items}",
     'Items: ["one","two","three"]',
     {"state": {"items": ["one", "two", "three"]}}, None, False),
    ("jmespath_nested_lookup", "Name: { state.nested.name }", "Name: John",
     {"state": {"nested": {"name": "John", "age": 42}}}, None, False),
    ("jmespath_array_index", "First item: { state.items[0] }",
     "First item: apple",
     {"state": {"items": ["apple", "banana", "cherry"]}}, None, False),
    ("jmespath_array_slice", "{ state.numbers[1:3] }", [2, 3],
     {"state": {"numbers": [1, 2, 3, 4, 5]}}, None, False),
    ("arithmetic_expression", "Total: { state.price * state.quantity }",
     "Total: 59.97", {"state": {"price": 19.99, "quantity": 3}},
     None, False),
    ("comparison_expression", "Is valid: { state.age >= 18 }",
     "Is valid: true", {"state": {"age": 21}}, None, False),
    ("logical_expression",
     "Access: { state.authenticated && state.authorized }", "Access: true",
     {"state": {"authenticated": True, "authorized": True}}, None, False),
    ("ternary_expression", 'Status: { if(state.active, "ON", "OFF") }',
     "Status: ON", {"state": {"active": True}}, None, False),
    ("if_function", "Result: { if(true, 3, 0) }", "Result: 3", {},
     None, False),
    ("coalesce_function", '{ coalesce("2025-01-01") }', "2025-01-01", {},
     None, False),
    ("value_function_with_state", '{ coalesce(state.value, "default") }',
     "provided", {"state": {"value": "provided"}}, None, False),
    ("string_concatenation", '{ "Hello, " + state.name + "!" }',
     "Hello, Alice!", {"state": {"name": "Alice"}}, None, False),
    ("empty_string_input", "", "", {}, None, False),
    ("no_brackets", "No variables here", "No variables here", {},
     None, False),
    ("non_existent_variable_1", "{ state.missing }", None,
     {"state": {}}, None, False),
    ("non_existent_variable_2", "Value: { state.missing }", "Value: ",
     {"state": {}}, None, False),
    ("non_existent_variable_3", "Foo: { state.foo } | Bar: { env.bar } ",
     "Foo:  | Bar:  ", {}, None, False),
    ("nested_brackets", "Nested: { state.prop1 }", "Nested: value1",
     {"state": {"key": "prop1", "prop1": "value1"}}, None, False),
    ("invalid_function", "Invalid: {invalid_function()}",
     "Invalid: {invalid_function()}", {}, None, False),
    ("invalid_expression_syntax", "Bad: { state.value ++ }", "",
     {"state": {"value": 5}}, None, True),
    ("no_compute_flag", "Expression: { state.value * 2 }",
     "Expression: 10", {"state": {"value": 5}},
     {"__sling_no_compute__": True}, False),
    ("multiple_brackets_in_string",
     "User {state.user} logged in at {env.TIME} from {state.location}",
     "User alice logged in at 14:30 from NYC",
     {"state": {"user": "alice", "location": "NYC"},
      "env": {"TIME": "14:30"}}, None, False),
    ("nested_state_access",
     "Config: {state.config.database.host}:{state.config.database.port}",
     "Config: localhost:5432",
     {"state": {"config": {"database": {"host": "localhost",
                                        "port": 5432}}}}, None, False),
    ("array_access_with_jmespath",
     "First user: {state.users[0].name}, Last user: {state.users[-1].name}",
     "First user: Alice, Last user: Charlie",
     {"state": {"users": [{"name": "Alice", "id": 1},
                          {"name": "Bob", "id": 2},
                          {"name": "Charlie", "id": 3}]}}, None, False),
    ("jmespath_filtering",
     "Active users: { state.users[?active == `true`].name }",
     'Active users: ["Alice","Charlie"]',
     {"state": {"users": [{"name": "Alice", "active": True},
                          {"name": "Bob", "active": False},
                          {"name": "Charlie", "active": True}]}},
     None, False),
    ("function_with_multiple_args",
     '{ coalesce(state.val1, state.val2, state.val3, "default") }',
     "value2",
     {"state": {"val1": None, "val2": "value2", "val3": "value3"}},
     None, False),
    ("nested_function_calls",
     '{ if(length(state.items) > 2, "many items", "few items") }',
     "many items", {"state": {"items": ["a", "b", "c", "d"]}}, None, False),
    ("mixed_types_in_expression",
     "Total: { state.price * state.quantity + state.tax }", "Total: 55.5",
     {"state": {"price": 10.5, "quantity": 5, "tax": 3.0}}, None, False),
    ("string_interpolation_with_nil",
     "User: {state.user}, Email: {state.email}", "User: john, Email: ",
     {"state": {"user": "john", "email": None}}, None, False),
    ("complex_conditional",
     'Status: { if(state.count > 100, "high", '
     'if(state.count > 50, "medium", "low")) }',
     "Status: medium", {"state": {"count": 75}}, None, False),
    ("escaped_brackets", "Template: {{not_replaced}} but {state.value} is",
     "Template: {{not_replaced}} but 42 is",
     {"state": {"value": 42}}, None, False),
    ("run_prefix_variable", "Run ID: {run.id}", "Run ID: 12345",
     {"run": {"id": "12345"}}, None, False),
    ("target_source_prefixes", "From {source.table} to {target.table}",
     "From users to users_copy",
     {"source": {"table": "users"}, "target": {"table": "users_copy"}},
     None, False),
    ("stream_object_prefixes",
     "Processing {stream.name} into {object.path}",
     "Processing data_stream into /tmp/output.csv",
     {"stream": {"name": "data_stream"},
      "object": {"path": "/tmp/output.csv"}}, None, False),
    ("timestamp_execution_prefixes",
     "Started at {timestamp.start}, execution {execution.id}",
     "Started at 2024-01-01T10:00:00Z, execution exec_123",
     {"timestamp": {"start": "2024-01-01T10:00:00Z"},
      "execution": {"id": "exec_123"}}, None, False),
    ("loop_prefix", "Loop iteration {loop.index} of {loop.total}",
     "Loop iteration 5 of 10", {"loop": {"index": 5, "total": 10}},
     None, False),
    ("boolean_operations",
     "Can proceed: { state.hasPermission && "
     "(state.isActive || state.isAdmin) }",
     "Can proceed: true",
     {"state": {"hasPermission": True, "isActive": False,
                "isAdmin": True}}, None, False),
    ("modulo_operation", "Remainder: { state.value % 3 }", "Remainder: 2",
     {"state": {"value": 8}}, None, False),
    ("bitwise_operations", "Result: { state.a & state.b }", "Result: 8",
     {"state": {"a": 12, "b": 10}}, None, False),
    ("nested_brackets_in_ternary",
     '{!is_null(state.field) ? "{" + state.field + "}" : "default"}',
     "{MyField}", {"state": {"field": "MyField"}}, None, False),
    ("nested_brackets_in_ternary_null",
     '{!is_null(state.field) ? "{" + state.field + "}" : "default"}',
     "default", {"state": {"field": None}}, None, False),
    ("nested_brackets_complex_airtable",
     '{!is_null(state.last_modified_field) ? '
     '"{" + state.last_modified_field + "} > \'2025-01-01\'" : null}',
     "{Updated At} > '2025-01-01'",
     {"state": {"last_modified_field": "Updated At"}}, None, False),
]


@pytest.mark.parametrize(
    "name,inp,expected,state,extras,expect_error",
    RENDER_CASES, ids=[c[0] for c in RENDER_CASES])
def test_evaluator_render(name, inp, expected, state, extras, expect_error):
    ev = _ev(state)
    if expect_error:
        with pytest.raises(ExpressionError):
            ev.render(inp, extras)
        return
    assert ev.render(inp, extras) == expected


# ------------------------------------------------ TestEvaluatorRenderPayload

PAYLOAD_CASES = [
    ("render_string_map",
     {"name": "{ state.user.name }", "age": "{ state.user.age }",
      "active": "{ state.active }", "missing": "{ state.missing }",
      "literal": "plain text"},
     {"name": "John Doe", "age": 25, "active": True, "missing": None,
      "literal": "plain text"},
     {"state": {"user": {"name": "John Doe", "age": 25}, "active": True}}),
    # Go map[any]any: keys stringify through json.Marshal
    ("render_any_map",
     {"key1": "{ state.VAR1 }", "key2": "{ store.data }",
      123: "{ state.numeric }", True: "literal"},
     {"key1": "value1", "key2": "stored", "123": 456, "true": "literal"},
     {"state": {"VAR1": "value1", "numeric": 456},
      "store": {"data": "stored"}}),
    ("render_nested_maps",
     {"config": {"host": "{ state.HOST }", "port": "{ state.PORT }",
                 "settings": {"timeout": "{ state.timeout_ms }",
                              "retries": "{ state.max_retries }"}}},
     {"config": {"host": "localhost", "port": "8080",
                 "settings": {"timeout": 5000, "retries": 3}}},
     {"state": {"HOST": "localhost", "PORT": "8080", "timeout_ms": 5000,
                "max_retries": 3}}),
    ("render_array",
     ["{ state.item1 }", "{ state.item2 }", "literal value",
      {"nested": "{ state.item3 }"}],
     ["first", "second", "literal value", {"nested": "third"}],
     {"state": {"item1": "first", "item2": "second", "item3": "third"}}),
    ("render_string_array",
     ["{ state.PATH1 }", "{ state.PATH2 }", "/static/path"],
     ["/usr/bin", "/usr/local/bin", "/static/path"],
     {"state": {"PATH1": "/usr/bin", "PATH2": "/usr/local/bin"}}),
    ("render_complex_structure",
     {"users": [{"id": "{ state.user1.id }", "name": "{ state.user1.name }"},
                {"id": "{ state.user2.id }",
                 "name": "{ state.user2.name }"}],
      "total": "{ length(state.users) }"},
     {"users": [{"id": 1, "name": "Alice"}, {"id": 2, "name": "Bob"}],
      "total": 2},
     {"state": {"user1": {"id": 1, "name": "Alice"},
                "user2": {"id": 2, "name": "Bob"},
                "users": [{"id": 1, "name": "Alice"},
                          {"id": 2, "name": "Bob"}]}}),
    ("non_renderable_types",
     {"number": 42, "bool": True, "nil": None, "float": 3.14},
     {"number": 42, "bool": True, "nil": None, "float": 3.14}, {}),
    ("render_with_env_store_prefixes",
     {"env_mode": "{ env.MODE }", "store_data": "{ store.cache_key }",
      "combined": "Mode: { env.MODE }, Cache: { store.cache_key }"},
     {"env_mode": "production", "store_data": "user_123",
      "combined": "Mode: production, Cache: user_123"},
     {"env": {"MODE": "production"}, "store": {"cache_key": "user_123"}}),
    ("render_deeply_nested",
     {"level1": {"level2": {"level3": [
         {"value": "{ state.deep.value }",
          "items": ["{ state.item1 }", "{ state.item2 }"]}]}}},
     {"level1": {"level2": {"level3": [
         {"value": "nested_value", "items": ["first", "second"]}]}}},
     {"state": {"deep": {"value": "nested_value"}, "item1": "first",
                "item2": "second"}}),
    ("render_with_expressions",
     {"calculation": "{ state.a + state.b }",
      "condition": '{ if(state.enabled, "active", "inactive") }',
      "array_op": "{ length(state.items) }"},
     {"calculation": 15, "condition": "active", "array_op": 3},
     {"state": {"a": 10, "b": 5, "enabled": True,
                "items": ["a", "b", "c"]}}),
]


@pytest.mark.parametrize("name,inp,expected,state", PAYLOAD_CASES,
                         ids=[c[0] for c in PAYLOAD_CASES])
def test_evaluator_render_payload(name, inp, expected, state):
    assert _ev(state).render(inp) == expected


# -------------------------------------------------- TestEvaluatorExtractVars

EXTRACT_PREFIXES = ("env", "state", "secrets", "auth", "response",
                    "request", "sync", "context")

EXTRACT_CASES = [
    ("empty_string", "", []),
    ("no_references", 'value(123, 456, "2025-01-01")', []),
    ("simple_env_reference", 'value(env.START_DATE, "2025-01-01")',
     ["env.START_DATE"]),
    ("simple_state_reference", 'value(state.max_start_time, "2025-01-01")',
     ["state.max_start_time"]),
    ("simple_secrets_reference", 'value(secrets.API_KEY, "default-key")',
     ["secrets.API_KEY"]),
    ("simple_auth_reference", 'value(auth.token, "default-token")',
     ["auth.token"]),
    ("multiple_references",
     'value(env.START_DATE, state.max_start_time, "2025-01-01")',
     ["env.START_DATE", "state.max_start_time"]),
    ("references_with_quotes", 'log("auth.token: " + auth.token)',
     ["auth.token"]),
    ("references_in_quotes",
     'log("env.DEBUG should not be extracted but " + env.DEBUG + " should")',
     ["env.DEBUG"]),
    ("reference_in_the_middle",
     'concat("prefix_", state.user_id, "_suffix")', ["state.user_id"]),
    ("nested_functions",
     'value(env.END_DATE, date_format(now(), "%Y-%m-%dT%H:%M:%S.%fZ"))',
     ["env.END_DATE"]),
    ("complex_expression",
     'if(is_null(state.last_run_date), now(), '
     'date_add(state.last_run_date, "1d"))',
     ["state.last_run_date", "state.last_run_date"]),
    ("reference_with_underscore",
     "value(state.last_sync_time, state.default_time)",
     ["state.last_sync_time", "state.default_time"]),
    ("reference_with_numbers", "value(env.API_KEY2, secrets.BACKUP_KEY1)",
     ["env.API_KEY2", "secrets.BACKUP_KEY1"]),
    ("parameter_inside_quotes",
     'format("The value of state.count is {}", state.count1)',
     ["state.count1"]),
    ("escaped_quotes",
     'value(state.query, "SELECT * FROM \\"table\\" WHERE id = 5")',
     ["state.query"]),
    ("context_vars", "context.store.user_id", ["context.store.user_id"]),
]


@pytest.mark.parametrize("name,expr,expected", EXTRACT_CASES,
                         ids=[c[0] for c in EXTRACT_CASES])
def test_evaluator_extract_vars(name, expr, expected):
    ev = Evaluator(var_prefixes=EXTRACT_PREFIXES)
    assert sorted(ev.extract_vars(expr)) == sorted(expected)


# ---------------------------------------------- TestEvaluatorFillMissingKeys

FILL_CASES = [
    ("2-level key - simple", {}, ["state.value"],
     {"state": {"value": None}}),
    ("3-level key", {}, ["context.store.user_id"],
     {"context": {"store": {"user_id": None}}}),
    ("4-level key", {}, ["context.store.user_id.part4"],
     {"context": {"store": {"user_id": {"part4": None}}}}),
    ("existing intermediate levels",
     {"state": {"nested": {"existing": "value"}}}, ["state.nested.new_key"],
     {"state": {"nested": {"existing": "value", "new_key": None}}}),
    ("mixed levels", {},
     ["state.simple", "env.nested.key", "store.deep.nested.value"],
     {"state": {"simple": None}, "env": {"nested": {"key": None}},
      "store": {"deep": {"nested": {"value": None}}}}),
    ("key already exists with value",
     {"state": {"nested": {"key": "existing_value"}}}, ["state.nested.key"],
     {"state": {"nested": {"key": "existing_value"}}}),
    ("invalid prefix - should skip", {}, ["invalid.key.path"], {}),
    ("single part - should skip", {}, ["state"], {}),
    ("5-level deep nesting", {}, ["context.a.b.c.d.e"],
     {"context": {"a": {"b": {"c": {"d": {"e": None}}}}}}),
    ("multiple vars with shared prefixes", {},
     ["state.user.id", "state.user.name", "state.user.profile.email"],
     {"state": {"user": {"id": None, "name": None,
                         "profile": {"email": None}}}}),
    ("partially existing nested structure",
     {"context": {"store": {"existing_key": "value"}}},
     ["context.store.user_id.nested"],
     {"context": {"store": {"existing_key": "value",
                            "user_id": {"nested": None}}}}),
    ("non-map value in path - should skip",
     {"state": {"user": "john_doe"}}, ["state.user.profile.name"],
     {"state": {"user": "john_doe"}}),
]


@pytest.mark.parametrize("name,initial,vars_to_check,expected", FILL_CASES,
                         ids=[c[0] for c in FILL_CASES])
def test_evaluator_fill_missing_keys(name, initial, vars_to_check, expected):
    ev = Evaluator(var_prefixes=("state", "store", "env", "context"))
    assert ev.fill_missing_keys(initial, vars_to_check) == expected


# --------------------------------------------- TestEvaluatorCheckExpression

CHECK_CASES = [
    ("empty_expression", "", None),
    ("simple_expression_no_quotes", "state.counter > 10", None),
    ("valid_double_quotes", 'state.name == "John"', None),
    ("multiple_valid_double_quotes",
     'state.firstName == "John" && state.lastName == "Doe"', None),
    ("nested_double_quotes_with_escape",
     'state.message == "He said \\"Hello\\""', None),
    ("single_quote_error", "state.name == 'John'",
     "cannot use single quotes"),
    ("single_quote_in_middle",
     "state.name == \"John\" && state.title == 'Mr'",
     "cannot use single quotes"),
    ("single_quote_at_beginning", "'test' == state.value",
     "cannot use single quotes"),
    ("apostrophe_outside_double_quotes", 'state.name == "John\'s car"',
     None),
    ("apostrophe_and_single_quote_mix",
     "state.name == \"John's car\" && state.other == 'test'",
     "cannot use single quotes"),
    ("escaped_double_quote", 'state.quote == "She said \\"hi\\""', None),
    ("multiple_escaped_double_quotes",
     'state.json == "{\\"name\\": \\"John\\", \\"age\\": 30}"', None),
    ("single_quote_after_escaped_double_quote",
     'state.text == "He said \\"hello\\"" && state.bad == \'world\'',
     "cannot use single quotes"),
    ("complex_valid_expression",
     'response.status == 200 && response.data.message == "Success" '
     '&& len(response.items) > 0', None),
    ("backslash_before_single_quote_still_error",
     'state.test == "valid" && state.invalid == \\\'bad\\\'',
     "cannot use single quotes"),
    ("double_backslash_before_double_quote",
     'state.path == "C:\\\\Program Files\\\\"', None),
    ("single_quote_inside_double_quotes_is_valid",
     'state.message == "Don\'t do that"', None),
    ("unclosed_double_quote_with_single_quote",
     'state.name == "John && state.other == \'test\'',
     "unclosed double quote"),
    ("only_single_quotes", "'hello world'", "cannot use single quotes"),
    ("only_double_quotes", '"hello world"', None),
    ("mixed_quotes_complex",
     'state.a == "test" && state.b == \'invalid\' && state.c == "valid"',
     "cannot use single quotes"),
    ("unicode_characters_with_double_quotes",
     'state.emoji == "Hello \U0001f44b world"', None),
    ("unicode_characters_with_single_quotes",
     "state.emoji == 'Hello \U0001f44b world'",
     "cannot use single quotes"),
    ("json_like_string",
     'state.config == "{\\"timeout\\": 30, \\"retries\\": 3}"', None),
    ("regex_like_pattern_double_quotes",
     'state.pattern == "^[a-zA-Z0-9]+$"', None),
    ("regex_like_pattern_single_quotes",
     "state.pattern == '^[a-zA-Z0-9]+$'", "cannot use single quotes"),
    ("empty_string_double_quotes", 'state.value == ""', None),
    ("empty_string_single_quotes", "state.value == ''",
     "cannot use single quotes"),
    ("multiple_consecutive_escapes",
     'state.path == "C:\\\\\\\\server\\\\\\\\path\\\\\\\\"', None),
    ("quote_at_end_of_string",
     'state.sql == "SELECT * FROM table WHERE name = \\"John\\""', None),
    ("single_quote_at_very_end", "someexpression'",
     "cannot use single quotes"),
    ("double_quote_at_very_end", 'someexpression"',
     "unclosed double quote"),
    ("valid_parentheses_simple", "func(arg1, arg2)", None),
    ("valid_parentheses_nested", "outer(inner(value), other)", None),
    ("valid_parentheses_multiple", "func1() && func2(arg) || func3(a, b)",
     None),
    ("unclosed_parenthesis_simple", "func(arg1, arg2",
     "unclosed parenthesis"),
    ("unclosed_parenthesis_nested", "outer(inner(value), other",
     "unclosed parenthesis"),
    ("extra_closing_parenthesis", "func(arg1, arg2))",
     "unmatched closing parenthesis"),
    ("parentheses_inside_double_quotes_valid",
     'state.value == "text with (parentheses)"', None),
    ("unclosed_quote_simple", 'state.name == "John',
     "unclosed double quote"),
    ("unclosed_quote_at_beginning", '"unclosed string and other code',
     "unclosed double quote"),
    ("mixed_unclosed_quote_and_paren",
     'func("unclosed string and missing paren', "unclosed double quote"),
    ("mixed_unclosed_paren_after_quote",
     'func("closed string" and missing paren', "unclosed parenthesis"),
    ("complex_valid_expression_with_quotes_and_parens",
     'len(state.items) > 0 && state.name == "John" && func(state.age)',
     None),
    ("parentheses_with_escaped_quotes",
     'func(state.message == "He said \\"Hello\\"")', None),
    ("multiple_unclosed_parentheses", "outer(inner(deep(value)",
     "unclosed parenthesis"),
    ("parentheses_only_closing", ")", "unmatched closing parenthesis"),
    ("parentheses_only_opening", "(", "unclosed parenthesis"),
    ("empty_parentheses", "func()", None),
    ("odd_escapes_before_quote",
     'state.text == "He said \\\\\\"Hello\\\\\\""', None),
    ("escaped_backslash_before_quote", 'state.path == "C:\\\\\\\\"', None),
    ("parentheses_and_quotes_complex",
     'func(state.name == "value") && other("test")', None),
    ("nested_parens_with_unclosed_quote",
     'func(inner(state.name == "unclosed))', "unclosed double quote"),
]


@pytest.mark.parametrize("name,expression,error_msg", CHECK_CASES,
                         ids=[c[0] for c in CHECK_CASES])
def test_evaluator_check_expression(name, expression, error_msg):
    ev = Evaluator()
    if error_msg is None:
        ev.check(expression)  # must not raise
    else:
        with pytest.raises(ExpressionError, match=None) as exc:
            ev.check(expression)
        assert error_msg in str(exc.value)


# -------------------------------------------------- TestEvaluatorLiterals

def test_literals_direct_evaluate():
    variables = {
        "object": {"a": 1, "b": 1, "echo": lambda a: a},
        "array": [{"id": 1}, {"id": 2}],
        "array_empty": [],
    }
    ev = Evaluator()
    assert ev.evaluate("object.a", extras=variables) == 1
    assert ev.evaluate('jmespath(array, "[-1].id")', extras=variables) == 2
    assert ev.evaluate('jmespath(array_empty, "[-1].id")',
                       extras=variables) is None
    # DELIBERATE DIVERGENCE: the reference's goval errors on a negative
    # index into an empty array; our evaluator resolves pure paths with
    # the jmespath miss->nil contract everywhere (consistent with the
    # jmespath() function above), so this is None, not an error.
    assert ev.evaluate("array_empty[-1].id", extras=variables) is None


# --------------------------------------------- TestEvaluatorKeepMissingExpr

KEEP_PREFIXES = ("state", "store", "env", "secrets")

GRAPHQL_IN = """{
  repository(owner: "{state.owner}", name: "{state.repo}") {
    stargazers(first: 100) {
      totalCount
    }
  }
}"""
GRAPHQL_OUT = """{
  repository(owner: "octocat", name: "hello-world") {
    stargazers(first: 100) {
      totalCount
    }
  }
}"""

KEEP_CASES = [
    # (name, input, expected, state, keep_missing)
    ("missing_variable_kept_intact", "Value: {state.missing_var}",
     "Value: {state.missing_var}", {}, True),
    ("missing_nested_variable_kept_intact",
     "Config: {state.config.database.host}",
     "Config: {state.config.database.host}", {}, True),
    ("multiple_missing_variables_kept_intact",
     "User: {state.user}, Email: { upper(state.email) }",
     "User: {state.user}, Email: { upper(state.email) }", {}, True),
    ("mixed_existing_and_missing_variables",
     "Name: {state.name}, Missing: {state.missing}",
     "Name: John, Missing: {state.missing}",
     {"state": {"name": "John"}}, True),
    ("missing_env_variable_kept_intact", "API: {env.API_URL}",
     "API: {env.API_URL}", {}, True),
    ("missing_store_variable_kept_intact", "Cache: {store.cache_key}",
     "Cache: {store.cache_key}", {}, True),
    ("missing_deeply_nested_variable_kept_intact",
     "Path: {state.level1.level2.level3.value}",
     "Path: {state.level1.level2.level3.value}", {}, True),
    ("partially_missing_nested_path", "Value: {state.config.missing.field}",
     "Value: {state.config.missing.field}",
     {"state": {"config": {"existing": "value"}}}, True),
    ("direct_missing_expression", "{state.missing}", "{state.missing}",
     {}, True),
    ("missing_variable_evaluated_to_empty", "Value: {state.missing_var}",
     "Value: ", {}, False),
    ("missing_nested_variable_evaluated_to_empty",
     "Config: {state.config.database.host}", "Config: ", {}, False),
    ("direct_missing_expression_evaluated_to_nil", "{state.missing}",
     None, {}, False),
    ("mixed_existing_and_missing_default_behavior",
     "Name: {state.name}, Missing: {state.missing}",
     "Name: John, Missing: ", {"state": {"name": "John"}}, False),
    ("missing_variable_in_expression_kept", "Result: {state.missing * 2}",
     "Result: {state.missing * 2}", {}, True),
    ("missing_variable_in_comparison_kept", "Valid: {state.missing > 10}",
     "Valid: {state.missing > 10}", {}, True),
    ("multiple_expressions_some_missing",
     "A: {state.existing}, B: {state.missing}, C: {state.another}",
     "A: found, B: {state.missing}, C: {state.another}",
     {"state": {"existing": "found"}}, True),
    ("template_with_missing_placeholders",
     "Hello {state.username}, your balance is {state.account.balance}",
     "Hello {state.username}, your balance is {state.account.balance}",
     {}, True),
    ("api_url_template_with_missing_vars",
     "https://api.example.com/{env.VERSION}/users/{state.user_id}",
     "https://api.example.com/{env.VERSION}/users/{state.user_id}",
     {}, True),
    ("sql_query_template_with_missing_vars",
     "SELECT * FROM users WHERE id = {state.user_id} "
     "AND status = '{state.status}'",
     "SELECT * FROM users WHERE id = {state.user_id} "
     "AND status = '{state.status}'", {}, True),
    ("some_vars_exist_some_dont",
     "Config: host={env.HOST}, port={env.PORT}, db={env.DATABASE}",
     "Config: host=localhost, port={env.PORT}, db={env.DATABASE}",
     {"env": {"HOST": "localhost"}}, True),
    ("nested_map_with_missing_field",
     "User: {state.user.name}, Role: {state.user.role}",
     "User: Alice, Role: {state.user.role}",
     {"state": {"user": {"name": "Alice"}}}, True),
    ("empty_state_all_missing", "{state.a} {state.b} {state.c}",
     "{state.a} {state.b} {state.c}", {}, True),
    ("nil_state_handled_gracefully", "Value: {state.value}",
     "Value: {state.value}", None, True),
    ("graphql_query_with_template_vars", GRAPHQL_IN, GRAPHQL_OUT,
     {"state": {"owner": "octocat", "repo": "hello-world"}}, True),
    ("graphql_inline_query",
     '{ repository(owner: "{state.owner}") { name } }',
     '{ repository(owner: "myowner") { name } }',
     {"state": {"owner": "myowner"}}, True),
]


@pytest.mark.parametrize("name,inp,expected,state,keep", KEEP_CASES,
                         ids=[c[0] for c in KEEP_CASES])
def test_evaluator_keep_missing_expr(name, inp, expected, state, keep):
    ev = _ev(state, prefixes=KEEP_PREFIXES, keep_missing=keep)
    assert ev.render(inp) == expected


# --------------------------------------------- TestEvaluatorAllowNoPrefix

ANP_PREFIXES = ("state", "store", "env", "secrets")

ANP_CASES = [
    # (name, input, expected, state, allow_no_prefix)
    ("simple_unprefixed_variable", "Hello, {MY_VAR}!", "Hello, World!",
     {"MY_VAR": "World"}, True),
    ("multiple_unprefixed_variables", "User: {USERNAME}, ID: {USER_ID}",
     "User: alice, ID: 123", {"USERNAME": "alice", "USER_ID": 123}, True),
    ("unprefixed_variable_direct_value", "{COUNTER}", 42,
     {"COUNTER": 42}, True),
    ("mixed_prefixed_and_unprefixed", "Env: {env.MODE}, Var: {MY_VAR}",
     "Env: production, Var: test",
     {"env": {"MODE": "production"}, "MY_VAR": "test"}, True),
    ("mixed_state_and_unprefixed",
     "State value: {state.value}, Custom: {CUSTOM}",
     "State value: 10, Custom: 20",
     {"state": {"value": 10}, "CUSTOM": 20}, True),
    ("unprefixed_without_allow_no_prefix", "Value: {MY_VAR}",
     "Value: {MY_VAR}", {"MY_VAR": "test"}, False),
    ("prefixed_works_without_allow_no_prefix", "Value: {state.value}",
     "Value: 100", {"state": {"value": 100}}, False),
    ("unprefixed_with_underscore", "{SOME_LONG_VAR_NAME}", "value",
     {"SOME_LONG_VAR_NAME": "value"}, True),
    ("unprefixed_lowercase", "{my_var}", "lowercase",
     {"my_var": "lowercase"}, True),
    ("unprefixed_with_numbers", "{VAR123}", "numbered",
     {"VAR123": "numbered"}, True),
    ("unprefixed_missing_variable", "{MISSING}", None, {}, True),
    ("unprefixed_in_string_context",
     "Prefix: {PREFIX}, Value: {VALUE}, Suffix: {SUFFIX}",
     "Prefix: pre, Value: val, Suffix: post",
     {"PREFIX": "pre", "VALUE": "val", "SUFFIX": "post"}, True),
    ("unprefixed_in_arithmetic", "Total: {COUNT * 2}", "Total: 20",
     {"COUNT": 10}, True),
    ("unprefixed_in_comparison", "Valid: {AGE >= 18}", "Valid: true",
     {"AGE": 21}, True),
    ("unprefixed_in_function", 'Result: {if(ENABLED, "yes", "no")}',
     "Result: yes", {"ENABLED": True}, True),
    ("coalesce_with_unprefixed", "{coalesce(MISSING_VAR, DEFAULT_VALUE)}",
     "default", {"DEFAULT_VALUE": "default"}, True),
    ("nested_if_with_unprefixed",
     '{if(PREMIUM, if(ADMIN, "premium-admin", "premium-user"), "free")}',
     "premium-admin", {"PREMIUM": True, "ADMIN": True}, True),
    ("string_concat_with_unprefixed", '{FIRST_NAME + " " + LAST_NAME}',
     "John Doe", {"FIRST_NAME": "John", "LAST_NAME": "Doe"}, True),
    ("cast_function_with_unprefixed", '{cast(NUMBER_VAR, "string")}', "42",
     {"NUMBER_VAR": 42}, True),
    ("mixed_prefixed_unprefixed_in_function",
     '{coalesce(env.API_KEY, BACKUP_KEY, "default-key")}', "backup123",
     {"env": {}, "BACKUP_KEY": "backup123"}, True),
    ("logical_and_with_unprefixed", "{AUTHENTICATED && AUTHORIZED}", True,
     {"AUTHENTICATED": True, "AUTHORIZED": True}, True),
    ("logical_or_with_unprefixed", "{IS_ADMIN || IS_MODERATOR}", True,
     {"IS_ADMIN": False, "IS_MODERATOR": True}, True),
    ("ternary_with_unprefixed",
     '{STATUS == "active" ? ACTIVE_COUNT : INACTIVE_COUNT}', 100,
     {"STATUS": "active", "ACTIVE_COUNT": 100, "INACTIVE_COUNT": 5}, True),
    ("multiple_unprefixed_in_complex_expression",
     "{(PRICE * QUANTITY) + TAX - DISCOUNT}", 115.0,
     {"PRICE": 10.0, "QUANTITY": 10, "TAX": 20.0, "DISCOUNT": 5.0}, True),
    ("unprefixed_in_map", {"key": "{MY_VALUE}"}, {"key": "mapped"},
     {"MY_VALUE": "mapped"}, True),
    ("unprefixed_in_array", ["{ITEM1}", "{ITEM2}"], ["first", "second"],
     {"ITEM1": "first", "ITEM2": "second"}, True),
    ("complex_mixed_scenario",
     "API: {API_URL}, Token: {secrets.token}, User: {USERNAME}",
     "API: https://api.example.com, Token: abc123, User: john",
     {"API_URL": "https://api.example.com",
      "secrets": {"token": "abc123"}, "USERNAME": "john"}, True),
    ("unprefixed_with_nested_map",
     {"config": {"host": "{HOST}", "port": "{PORT}"}},
     {"config": {"host": "localhost", "port": 8080}},
     {"HOST": "localhost", "PORT": 8080}, True),
    ("prefix_name_rendered_as_json", "State: {state.value}, Prefix: {state}",
     'State: 5, Prefix: {"value":5}', {"state": {"value": 5}}, True),
]


@pytest.mark.parametrize("name,inp,expected,state,allow", ANP_CASES,
                         ids=[c[0] for c in ANP_CASES])
def test_evaluator_allow_no_prefix(name, inp, expected, state, allow):
    ev = _ev(state, prefixes=ANP_PREFIXES, allow_no_prefix=allow)
    assert ev.render(inp) == expected


# ------------------------------- TestEvaluatorExtractVarsWithAllowNoPrefix

ANP_EXTRACT_CASES = [
    ("extract_unprefixed_variable", "MY_VAR", ["MY_VAR"], True),
    ("extract_multiple_unprefixed", "VAR1 + VAR2", ["VAR1", "VAR2"], True),
    ("extract_mixed_prefixed_unprefixed", "env.MODE + MY_VAR",
     ["env.MODE", "MY_VAR"], True),
    ("unprefixed_with_function", "if(ENABLED, state.value, 0)",
     ["ENABLED", "state.value"], True),
    ("unprefixed_in_string_concat", '"Prefix: " + MY_VAR + " Suffix"',
     ["MY_VAR"], True),
    ("skip_prefixes_themselves", "state.value + env", ["state.value"],
     True),
    ("no_extraction_without_allow_no_prefix", "MY_VAR", [], False),
    ("only_prefixed_extracted_without_allow", "env.MODE + MY_VAR",
     ["env.MODE"], False),
]


@pytest.mark.parametrize("name,expr,expected,allow", ANP_EXTRACT_CASES,
                         ids=[c[0] for c in ANP_EXTRACT_CASES])
def test_extract_vars_allow_no_prefix(name, expr, expected, allow):
    ev = Evaluator(var_prefixes=("env", "state", "secrets"),
                   allow_no_prefix=allow)
    assert sorted(ev.extract_vars(expr)) == sorted(expected)


# --------------------------- TestEvaluatorFillMissingKeysWithAllowNoPrefix

ANP_FILL_CASES = [
    ("fill_unprefixed_variable", {}, ["MY_VAR"], {"MY_VAR": None}, True),
    ("fill_multiple_unprefixed", {}, ["VAR1", "VAR2", "VAR3"],
     {"VAR1": None, "VAR2": None, "VAR3": None}, True),
    ("fill_mixed_prefixed_and_unprefixed", {}, ["state.value", "MY_VAR"],
     {"state": {"value": None}, "MY_VAR": None}, True),
    ("dont_fill_unprefixed_without_allow", {}, ["MY_VAR"], {}, False),
    ("preserve_existing_unprefixed_value", {"MY_VAR": "existing"},
     ["MY_VAR"], {"MY_VAR": "existing"}, True),
]


@pytest.mark.parametrize("name,initial,vars_to_check,expected,allow",
                         ANP_FILL_CASES,
                         ids=[c[0] for c in ANP_FILL_CASES])
def test_fill_missing_keys_allow_no_prefix(name, initial, vars_to_check,
                                           expected, allow):
    ev = Evaluator(var_prefixes=("state", "env"), allow_no_prefix=allow)
    assert ev.fill_missing_keys(initial, vars_to_check) == expected


# ----------------------------------------------- TestEvaluatorFindMatches

GRAPHQL_CURSOR = """{
  repository(owner: "{state.owner}", name: "{state.repo}") {
    stargazers(first: 100, after: {state.cursor_param}) {
      edges {
        starredAt
        node {
          login
        }
      }
      pageInfo {
        endCursor
        hasNextPage
      }
    }
  }
}"""

FIND_CASES = [
    # (name, input, expected_or_None, error_msg_or_None)
    ("simple_expression", "Hello {state.name}!", ["state.name"], None),
    ("multiple_expressions", "{state.a} and {state.b}",
     ["state.a", "state.b"], None),
    ("no_expressions", "plain text", [], None),
    ("nested_brackets_in_string", '{"{" + state.field + "}"}',
     ['"{" + state.field + "}"'], None),
    ("airtable_filter_formula",
     '{!is_null(state.field) ? "{" + state.field + "} > \'value\'" : null}',
     ['!is_null(state.field) ? "{" + state.field + "} > \'value\'" : null'],
     None),
    ("multiple_nested_braces_in_string", '{func("{inner1}", "{inner2}")}',
     ['func("{inner1}", "{inner2}")'], None),
    ("unclosed_bracket", "Hello {state.name", None, "unclosed bracket"),
    ("unclosed_bracket_with_nested", '{"{" + state.field', None,
     "unclosed bracket"),
    ("empty_expression", "{}", [""], None),
    ("whitespace_expression", "{ state.name }", [" state.name "], None),
    ("escaped_quotes_in_expression", '{state.val == "test \\"quoted\\""}',
     ['state.val == "test \\"quoted\\""'], None),
    ("empty_input", "", [], None),
    ("consecutive_expressions", "{a}{b}{c}", ["a", "b", "c"], None),
    ("expression_with_newlines", "{\n  state.value\n}",
     ["\n  state.value\n"], None),
    ("deeply_nested_brackets_in_string", '{format("{{nested}}")}',
     ['format("{{nested}}")'], None),
    ("braces_in_quotes_simple", '{"{" + state.var + "}"}',
     ['"{" + state.var + "}"'], None),
    ("braces_in_quotes_json_build",
     '{"{\\"key\\": \\"" + state.value + "\\"}"}',
     ['"{\\"key\\": \\"" + state.value + "\\"}"'], None),
    ("mixed_quoted_and_unquoted_braces",
     '{ repository(owner: "{state.owner}") { name } }',
     ["state.owner", " name "], None),
    ("json_object_with_template_vars",
     '{"filters":{"from":"{state.from_date}"},"limit":{state.limit},'
     '"sort_order":"asc"}',
     ["state.from_date", "state.limit"], None),
    ("json_object_with_spaces", '{ "key": "{state.value}" }',
     ["state.value"], None),
    ("json_object_multiline",
     '{\n  "filters" : {"from":"{state.from_date}"},\n'
     '  "limit" : {state.limit}\n}',
     ["state.from_date", "state.limit"], None),
    ("json_array_with_template_vars", '["{state.a}", "{state.b}"]',
     ["state.a", "state.b"], None),
    ("pure_template_expression_not_json", "{state.limit}",
     ["state.limit"], None),
    ("graphql_simple_query", GRAPHQL_IN,
     ["state.owner", "state.repo", "\n      totalCount\n    "], None),
    ("graphql_with_cursor_param", GRAPHQL_CURSOR,
     ["state.owner", "state.repo", "state.cursor_param",
      "\n          login\n        ",
      "\n        endCursor\n        hasNextPage\n      "], None),
    ("graphql_inline", '{ repository(owner: "{state.owner}") { name } }',
     ["state.owner", " name "], None),
]


@pytest.mark.parametrize("name,inp,expected,error_msg", FIND_CASES,
                         ids=[c[0] for c in FIND_CASES])
def test_evaluator_find_matches(name, inp, expected, error_msg):
    ev = Evaluator()
    if error_msg:
        with pytest.raises(ExpressionError) as exc:
            ev.find_matches(inp)
        assert error_msg in str(exc.value)
    else:
        assert ev.find_matches(inp) == expected


# ------------------------------------------ TestEvaluatorRenderJmespathJq

JPJQ_CASES = [
    ("jmespath_state_var_with_flatten", "{state.endpoint_name}[]",
     "Employee[]", {"state": {"endpoint_name": "Employee"}}),
    ("jmespath_state_var_nested_path", "{state.resource}.data[]",
     "users.data[]", {"state": {"resource": "users"}}),
    ("jmespath_state_var_with_child_selector",
     "{state.root}[].{state.field}", "results[].name",
     {"state": {"root": "results", "field": "name"}}),
    ("jmespath_state_var_with_filter",
     "{state.collection}[?status=='active']", "orders[?status=='active']",
     {"state": {"collection": "orders"}}),
    ("jmespath_plain_data_flatten", "data[]", "data[]", {}),
    ("jmespath_plain_nested", "response.items[].name",
     "response.items[].name", {}),
    ("jmespath_plain_at_wrap", "[@]", "[@]", {}),
    ("jmespath_plain_wildcard", "data[*].id", "data[*].id", {}),
    ("jmespath_plain_filter_expr", "people[?age > `20`].name",
     "people[?age > `20`].name", {}),
    ("jmespath_plain_pipe",
     "locations[?state == 'WA'].name | sort(@) | "
     "{WashingtonCities: join(', ', @)}",
     "locations[?state == 'WA'].name | sort(@) | "
     "{WashingtonCities: join(', ', @)}", {}),
    ("jmespath_plain_multiselect_hash", "people[].{Name: name, Age: age}",
     "people[].{Name: name, Age: age}", {}),
    ("jq_state_var_simple", ".{state.field}[]", ".records[]",
     {"state": {"field": "records"}}),
    ("jq_plain_array_iter", ".data[]", ".data[]", {}),
    ("jq_plain_select", '.[] | select(.status == "active")',
     '.[] | select(.status == "active")', {}),
    ("jq_plain_object_construction", ".[] | {name: .name, id: .id}",
     ".[] | {name: .name, id: .id}", {}),
    ("jq_plain_nested_field", ".response.data[].items",
     ".response.data[].items", {}),
    ("jmespath_mixed_existing_and_missing",
     "{state.resource}[].{state.missing_field}",
     "items[].{state.missing_field}", {"state": {"resource": "items"}}),
    ("dynamic_endpoint_jmespath", "{state.endpoint_name}[]",
     "CustomerType[]", {"state": {"endpoint_name": "CustomerType"}}),
]


@pytest.mark.parametrize("name,inp,expected,state", JPJQ_CASES,
                         ids=[c[0] for c in JPJQ_CASES])
def test_evaluator_render_jmespath_jq(name, inp, expected, state):
    ev = _ev(state, prefixes=KEEP_PREFIXES, keep_missing=True)
    assert ev.render_string(inp) == expected
