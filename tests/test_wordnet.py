"""W12 WordNet load (convert_wn_xml_to_json.py + load_wordnet_into_db.py
semantics): POS map, synset-derived definitions deduped by (pos, gloss),
synonyms from co-member lemmas, antonyms from sense+synset relations,
similar from synset relations, id-dedup keeps first; feeds the W4
trigram lookup and perform_search."""

import pytest

from vyntr_spark.sources.wordnet import parse_wordnet_xml, wordnet_df

FIXTURE = """<LexicalResource>
<Lexicon>
  <Synset id="s-hot" partOfSpeech="a">
    <Definition>having a high temperature</Definition>
    <SynsetRelation relType="antonym" target="cold"/>
    <SynsetRelation relType="similar" target="warm"/>
    <SynsetRelation relType="hypernym" target="ignored"/>
  </Synset>
  <Synset id="s-dup" partOfSpeech="a">
    <Definition>having a high temperature</Definition>
    <ILIDefinition>ili gloss</ILIDefinition>
  </Synset>
  <Synset id="s-run" partOfSpeech="v">
    <Definition>move fast on foot</Definition>
  </Synset>
  <LexicalEntry id="w-hot-a">
    <Lemma writtenForm="hot" partOfSpeech="a"/>
    <Pronunciation>hɒt</Pronunciation>
    <Sense id="hot-1" synset="s-hot">
      <SenseExample>a hot day</SenseExample>
      <SenseRelation relType="antonym" target="chilly"/>
    </Sense>
    <Sense id="hot-2" synset="s-dup"/>
  </LexicalEntry>
  <LexicalEntry id="w-scorching">
    <Lemma writtenForm="scorching" partOfSpeech="a"/>
    <Sense id="scorch-1" synset="s-hot"/>
  </LexicalEntry>
  <LexicalEntry id="w-run">
    <Lemma writtenForm="run" partOfSpeech="v"/>
    <Sense id="run-1" synset="s-run"/>
  </LexicalEntry>
  <LexicalEntry id="w-run">
    <Lemma writtenForm="run-dup" partOfSpeech="n"/>
  </LexicalEntry>
</Lexicon>
</LexicalResource>"""


@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("wn") / "wn.xml"
    p.write_text(FIXTURE, encoding="utf-8")
    return str(p)


def test_parse_entry_semantics(xml_path):
    rows = {r["id"]: r for r in parse_wordnet_xml(xml_path)}
    hot = rows["w-hot-a"]
    assert hot["word"] == "hot"
    assert hot["part_of_speech"] == "adjective"  # POS map a -> adjective
    assert hot["pronunciations"] == ["hɒt"]
    # definitions: s-hot gloss + s-dup's identical (pos, gloss) DEDUPED,
    # s-dup's ILIDefinition kept
    glosses = [d["gloss"] for d in hot["definitions"]]
    assert glosses == ["having a high temperature", "ili gloss"]
    # antonyms: sense relation + synset relation, sorted; similar kept;
    # hypernym relation ignored
    assert hot["antonyms"] == ["chilly", "cold"]
    assert hot["similar_words"] == ["warm"]
    # synonyms: co-member lemma of s-hot (via senses), self excluded
    assert hot["synonyms"] == ["scorching"]
    assert rows["w-scorching"]["synonyms"] == ["hot"]


def test_id_dedup_keeps_first(spark, xml_path):
    df = wordnet_df(spark, xml_path)
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 3  # w-run duplicate dropped
    assert rows["w-run"]["word"] == "run"  # FIRST occurrence kept
    assert rows["w-run"]["part_of_speech"] == "verb"


def test_wordnet_feeds_perform_search(spark, xml_path):
    from datetime import date

    from vyntr_spark.serve import perform_search

    docs = spark.createDataFrame(
        [(0, "hot take on spark", "en", "a.example")],
        "doc_id long, text string, lang string, source string",
    )
    wn = wordnet_df(spark, xml_path)
    out = perform_search(
        docs, "hot", k=3, today=date(2025, 1, 1), wordnet=wn
    )
    words = [w["word"] for w in out["word"]]
    assert "hot" in words
