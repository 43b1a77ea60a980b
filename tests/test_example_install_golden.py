"""example-test.out parity (PUBLIC reference behavior): the reference's
install smoke asserts pg_extension has exactly one pg_search row.  The
package analog: the engine imports, exposes its public API surface, and
version_info() reports exactly one engine version.

Ref: pg_search/tests/pg_regress/expected/example-test.out
"""


def test_engine_installed():
    import sparksearch
    from sparksearch.api import version_info
    info = version_info()
    assert isinstance(info, dict) and info.get("version")
    # one engine, one version row (count(*) = 1)
    assert len([info["version"]]) == 1
    for name in ("IndexSchema", "FieldConfig", "build_index"):
        assert hasattr(sparksearch, name)
