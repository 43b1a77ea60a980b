"""pdb.snippets golden parity.

Expected strings ported from the reference's pg_regress expected output
(tests/pg_regress/expected/snippets.out): Tantivy SnippetGenerator
fragmentation — sequential token-boundary fragments, trailing non-token
chars trimmed, score = matched-occurrence count, sort (score desc,
position asc), limit/offset, offset-past-end → empty array.
"""

import pytest

from sparksearch.highlight import _all_fragments, _token_spans

DOCS = {
    1: 'The quick brown fox jumps over the lazy dog. The dog is very '
       'lazy. The fox is quick.',
    2: 'A lazy dog is a happy dog. Dogs are the best, especially a lazy '
       'one.',
    3: 'Foxes and dogs are not friends. A quick fox is a clever fox.',
    4: 'This text does not contain the search words.',
    5: 'The lazy brown dog, and the quick red fox. The dog and fox are '
       'here.',
    6: 'A sentence with no matching words.',
    7: 'A test sentence for testing. Another test sentence.',
}


def snips(doc_id, terms, max_chars=150, limit=None, offset=0,
          tags=('<b>', '</b>')):
    text = DOCS[doc_id]
    spans = _token_spans(text, 'default', {}, True)
    frags = _all_fragments(text, spans, set(terms), tags[0], tags[1],
                           max_chars)
    frags.sort(key=lambda f: (-f[0], f[1]))
    out = [f[2] for f in frags]
    end = offset + limit if limit is not None else None
    return out[offset:end]


GOLDEN = [
    # snippets.out "Basic usage with a single keyword"
    (1, ['lazy'], 150, None, 0,
     ['The quick brown fox jumps over the <b>lazy</b> dog. The dog is '
      'very <b>lazy</b>. The fox is quick']),
    (2, ['lazy'], 150, None, 0,
     ['A <b>lazy</b> dog is a happy dog. Dogs are the best, especially '
      'a <b>lazy</b> one']),
    (5, ['lazy'], 150, None, 0,
     ['The <b>lazy</b> brown dog, and the quick red fox. The dog and '
      'fox are here']),
    # "Multiple keywords (OR)"
    (1, ['fox', 'dog'], 150, None, 0,
     ['The quick brown <b>fox</b> jumps over the lazy <b>dog</b>. The '
      '<b>dog</b> is very lazy. The <b>fox</b> is quick']),
    (3, ['fox', 'dog'], 150, None, 0,
     ['Foxes and dogs are not friends. A quick <b>fox</b> is a clever '
      '<b>fox</b>']),
    # "Phrase search" — phrase terms highlighted individually
    (1, ['lazy', 'dog'], 150, None, 0,
     ['The quick brown fox jumps over the <b>lazy</b> <b>dog</b>. The '
      '<b>dog</b> is very <b>lazy</b>. The fox is quick']),
    # "small max_num_chars → multiple snippets per document"
    (1, ['fox'], 25, None, 0,
     ['The quick brown <b>fox</b> jumps', 'dog is very lazy. The <b>fox</b>']),
    (3, ['fox'], 25, None, 0,
     ['friends. A quick <b>fox</b> is a', 'clever <b>fox</b>']),
    (5, ['fox'], 25, None, 0,
     ['the quick red <b>fox</b>. The', 'dog and <b>fox</b> are here']),
    # limit / offset / offset-past-end
    (1, ['fox'], 25, 1, 0, ['The quick brown <b>fox</b> jumps']),
    (1, ['fox'], 25, 1, 1, ['dog is very lazy. The <b>fox</b>']),
    (1, ['fox'], 25, None, 2, []),
    # max_num_chars=40 'dog' — leading zero-hit fragment discarded
    (1, ['dog'], 40, None, 0,
     ['<b>dog</b>. The <b>dog</b> is very lazy. The fox is']),
    (2, ['dog'], 40, None, 0,
     ['A lazy <b>dog</b> is a happy <b>dog</b>. Dogs are the']),
    (5, ['dog'], 40, None, 0,
     ['The lazy brown <b>dog</b>, and the quick red',
      'fox. The <b>dog</b> and fox are here']),
    (5, ['dog'], 40, 1, 1, ['fox. The <b>dog</b> and fox are here']),
    (7, ['test'], 150, 1, 0,
     ['A <b>test</b> sentence for testing. Another <b>test</b> sentence']),
    (7, ['test'], 150, 1, 1, []),
    # multi-term, max 20: score desc then position asc
    (1, ['fox', 'dog', 'lazy', 'quick'], 20, None, 0,
     ['The <b>quick</b> brown <b>fox</b>', '<b>dog</b>. The <b>dog</b> is very',
      '<b>lazy</b>. The <b>fox</b> is', 'jumps over the <b>lazy</b>',
      '<b>quick</b>']),
    (5, ['fox', 'dog', 'lazy', 'quick'], 20, 2, 0,
     ['<b>fox</b>. The <b>dog</b> and <b>fox</b>',
      'The <b>lazy</b> brown <b>dog</b>']),
    (2, ['fox', 'dog', 'lazy', 'quick'], 20, 2, 1,
     ['happy <b>dog</b>. Dogs are', 'a <b>lazy</b> one']),
]


@pytest.mark.parametrize("doc_id,terms,mc,lim,off,expected", GOLDEN)
def test_snippets_golden(doc_id, terms, mc, lim, off, expected):
    assert snips(doc_id, terms, mc, lim, off) == expected


def test_custom_tags_golden():
    # snippets.out "Custom tags" (quick, <em>)
    assert snips(1, ['quick'], tags=('<em>', '</em>')) == [
        'The <em>quick</em> brown fox jumps over the lazy dog. The dog '
        'is very lazy. The fox is <em>quick</em>']
    assert snips(4, ['quick']) == []


def test_spark_path_matches_golden(spark):
    """End-to-end through with_snippets (parse query → term extraction →
    pandas UDF) on the golden table."""
    from pyspark.sql import functions as F
    from sparksearch.highlight import with_snippets
    from sparksearch.index import build_index
    from sparksearch.query import ast
    from sparksearch.schema import IndexSchema, FieldConfig
    docs = spark.createDataFrame(sorted(DOCS.items()), "id int, content string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    q = ast.Parse("fox OR dog", field="content")
    out = {r["id"]: r["snippets"] for r in
           with_snippets(idx, docs, q, "content", max_chars=150).collect()}
    assert out[1] == ['The quick brown <b>fox</b> jumps over the lazy '
                      '<b>dog</b>. The <b>dog</b> is very lazy. The '
                      '<b>fox</b> is quick']
    assert out[4] is None


def test_snippet_occurrence_limit_offset_golden(spark):
    """snippet_limit_offset.out (occurrence paging through pdb.snippet /
    pdb.snippet_positions "limit"/"offset" args): only selected
    occurrences highlight; an empty selection yields NULL rows."""
    from sparksearch import IndexSchema, FieldConfig, build_index
    from sparksearch.highlight import with_snippet, with_snippet_positions
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    rows = [
        (1, 'This is a test test of the snippet function with multiple '
            'test words'),
        (2, 'Another test of the snippet snippet function with repeated '
            'snippet words'),
        (3, 'Yet another test test test of the function function function'),
        (4, 'test Lorem ipsum dolor sit amet...test'),
    ]
    docs = spark.createDataFrame(rows, "id int, content string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    q = ast.Term("content", "test")
    scores = compile_query(idx, q)
    hits = scores.join(docs, scores["doc_id"] == docs["id"])

    def snippets(**kw):
        return {r["id"]: r["snippet"] for r in
                with_snippet(idx, hits, q, "content", **kw).collect()}

    def positions(**kw):
        return {r["id"]: ([(p["start"], p["end"]) for p in r["snippet_positions"]]
                          if r["snippet_positions"] is not None else None)
                for r in with_snippet_positions(idx, hits, q, "content",
                                                **kw).collect()}

    # unpaged: all occurrences highlighted
    assert snippets()[1] == ('This is a <b>test</b> <b>test</b> of the '
                             'snippet function with multiple <b>test</b> '
                             'words')
    assert positions()[1] == [(10, 14), (15, 19), (58, 62)]
    assert positions()[4] == [(0, 4), (34, 38)]

    # limit=1: first occurrence only
    s1 = snippets(occ_limit=1)
    assert s1[1] == ('This is a <b>test</b> test of the snippet function '
                     'with multiple test words')
    assert s1[4] == '<b>test</b> Lorem ipsum dolor sit amet...test'
    assert positions(occ_limit=1) == {1: [(10, 14)], 2: [(8, 12)],
                                      3: [(12, 16)], 4: [(0, 4)]}

    # limit=1 offset=1: second occurrence; single-occurrence docs → NULL
    s11 = snippets(occ_limit=1, occ_offset=1)
    assert s11[1] == ('This is a test <b>test</b> of the snippet function '
                      'with multiple test words')
    assert s11[2] is None
    assert s11[3] == ('Yet another test <b>test</b> test of the function '
                      'function function')
    assert s11[4] == 'test Lorem ipsum dolor sit amet...<b>test</b>'
    assert positions(occ_limit=1, occ_offset=1) == {
        1: [(15, 19)], 2: None, 3: [(17, 21)], 4: [(34, 38)]}

    # limit=5 offset=2: third occurrence onward
    s52 = snippets(occ_limit=5, occ_offset=2)
    assert s52[1] == ('This is a test test of the snippet function with '
                      'multiple <b>test</b> words')
    assert s52[2] is None and s52[4] is None
    assert s52[3] == ('Yet another test test <b>test</b> of the function '
                      'function function')
    assert positions(occ_limit=5, occ_offset=2) == {
        1: [(58, 62)], 2: None, 3: [(22, 26)], 4: None}

    # limit=0 → everything NULL
    assert set(snippets(occ_limit=0).values()) == {None}
    assert set(positions(occ_limit=0).values()) == {None}

    # limit=-1 → the reference's exact error (snippet_limit_offset.out)
    with pytest.raises(ValueError, match="limit must not be negative"):
        snippets(occ_limit=-1)
    with pytest.raises(ValueError, match="limit must not be negative"):
        positions(occ_limit=-1)

    # offset past every occurrence → all NULL, no error
    assert set(snippets(occ_offset=1000).values()) == {None}
    assert set(positions(occ_offset=1000).values()) == {None}

    # limit=None (the golden's "limit" => null) → unpaged, all highlighted
    assert snippets(occ_limit=None)[1] == snippets()[1]
    assert positions(occ_limit=None) == positions()

    # max_num_chars=20 with offset=2: the fragment is chosen around the
    # PAGED occurrence and only it highlights
    s20 = snippets(max_chars=20, occ_offset=2)
    assert s20[1] == 'multiple <b>test</b> words'
    assert s20[2] is None and s20[4] is None
    assert s20[3] == 'test <b>test</b> of the'

    # max_num_chars=0: the lone token IS the fragment
    s0 = snippets(max_chars=0, occ_offset=2)
    assert s0[1] == '<b>test</b>'
    assert s0[3] == '<b>test</b>'
    assert s0[2] is None and s0[4] is None
