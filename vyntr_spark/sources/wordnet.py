"""W12: WordNet LMF XML -> wordnet table (reference:
lexicon/tools/src/convert_wn_xml_to_json.py:14-259 for the XML->entry
semantics and lexicon/tools/src/load_wordnet_into_db.py:31-148 for the
table shape + id-dedup + trigram serving index).

Parse happens once on the driver (ElementTree — the reference is the
same single-process shape); WordNet is a bounded ~160k-entry dimension
table, so the Spark-side product is a broadcastable DataFrame feeding
the W4 trigram fuzzy lookup, not a distributed parse job. The heavy
side of W4 (trigram similarity against queries) stays distributed.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# POS code map — data constant mirrored from convert_wn_xml_to_json.py:14-24
POS_MAP = {
    "n": "noun",
    "v": "verb",
    "a": "adjective",
    "r": "adverb",
    "s": "adjective_satellite",
    "c": "conjunction",
    "p": "adposition",
    "x": "other",
    "u": "unknown",
}

WORDNET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("word", T.StringType(), False),
        T.StructField("part_of_speech", T.StringType(), True),
        T.StructField("pronunciations", T.ArrayType(T.StringType()), True),
        T.StructField(
            "definitions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pos", T.StringType(), True),
                        T.StructField("gloss", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("examples", T.ArrayType(T.StringType()), True),
        T.StructField("synonyms", T.ArrayType(T.StringType()), True),
        T.StructField("antonyms", T.ArrayType(T.StringType()), True),
        T.StructField("similar_words", T.ArrayType(T.StringType()), True),
    ]
)


def parse_wordnet_xml(xml_path: str) -> list[dict]:
    """LMF XML -> one dict per LexicalEntry, replicating the converter:
    definitions come from the senses' synsets (deduped by (pos, gloss),
    order preserved), examples dedup preserving order, synonyms = other
    member lemmas of the related synsets, antonyms from sense AND synset
    relations, similar_words from synset relations; sorted lists like
    the reference's final output."""
    root = ET.parse(xml_path).getroot()

    synsets: dict[str, dict] = {}
    senses: dict[str, dict] = {}
    synset_to_lemmas: defaultdict[str, set] = defaultdict(set)
    entries: list[dict] = []

    for lexicon in root.findall("Lexicon") + root.findall("LexiconExtension"):
        for syn in lexicon.findall("Synset"):
            sid = syn.get("id")
            if not sid:
                continue
            pos = POS_MAP.get(syn.get("partOfSpeech", "u"), "unknown")
            defs = []
            for d in syn.findall("Definition"):
                gloss = (d.text or "").strip()
                if gloss:
                    defs.append({"pos": pos, "gloss": gloss})
            ili = syn.find("ILIDefinition")
            if ili is not None and (ili.text or "").strip():
                defs.append({"pos": pos, "gloss": ili.text.strip()})
            rels = [
                {"type": r.get("relType"), "target": r.get("target")}
                for r in syn.findall("SynsetRelation")
                if r.get("target") and r.get("relType") in ("antonym", "similar")
            ]
            synsets[sid] = {"definitions": defs, "relations": rels, "pos": pos}

        for entry in lexicon.findall("LexicalEntry"):
            eid = entry.get("id")
            if not eid:
                continue
            lemma = entry.find("Lemma")
            form = lemma.get("writtenForm", "N/A") if lemma is not None else "N/A"
            pos = POS_MAP.get(
                lemma.get("partOfSpeech", "u") if lemma is not None else "u",
                "unknown",
            )
            prons = [
                p.text.strip() for p in entry.findall("Pronunciation")
                if (p.text or "").strip()
            ]
            sense_ids = []
            for sense in entry.findall("Sense"):
                sid = sense.get("id")
                if not sid:
                    continue
                sense_ids.append(sid)
                exs = [
                    e.text.strip() for e in sense.findall("SenseExample")
                    if (e.text or "").strip()
                ]
                rels = [
                    {"type": r.get("relType"), "target": r.get("target")}
                    for r in sense.findall("SenseRelation")
                    if r.get("target") and r.get("relType") == "antonym"
                ]
                senses[sid] = {
                    "synsetRef": sense.get("synset"),
                    "examples": exs,
                    "relations": rels,
                }
                if sense.get("synset"):
                    synset_to_lemmas[sense.get("synset")].add(form)
            entries.append(
                {"id": eid, "word": form, "pos": pos,
                 "pronunciations": prons, "sense_ids": sense_ids}
            )

    out: list[dict] = []
    for e in entries:
        defs: list[dict] = []
        seen_defs: set = set()
        examples: list[str] = []
        seen_ex: set = set()
        antonyms: set = set()
        similar: set = set()
        related: set = set()
        for sid in e["sense_ids"]:
            s = senses.get(sid)
            if not s:
                continue
            for ex in s["examples"]:
                if ex not in seen_ex:
                    examples.append(ex)
                    seen_ex.add(ex)
            for r in s["relations"]:
                antonyms.add(r["target"])
            syn_id = s.get("synsetRef")
            if syn_id:
                related.add(syn_id)
                info = synsets.get(syn_id)
                if not info:
                    continue
                for d in info["definitions"]:
                    key = (d["pos"], d["gloss"])
                    if key not in seen_defs:
                        defs.append(d)
                        seen_defs.add(key)
                for r in info["relations"]:
                    (antonyms if r["type"] == "antonym" else similar).add(
                        r["target"]
                    )
        synonyms = {
            lm for sid in related for lm in synset_to_lemmas.get(sid, ())
            if lm != e["word"]
        }
        out.append(
            {
                "id": e["id"],
                "word": e["word"],
                "part_of_speech": e["pos"],
                "pronunciations": e["pronunciations"],
                "definitions": defs,
                "examples": examples,
                "synonyms": sorted(synonyms),
                "antonyms": sorted(antonyms),
                "similar_words": sorted(similar),
            }
        )
    return out


def wordnet_df(spark: SparkSession, xml_path: str) -> DataFrame:
    """Parse + load as the wordnet table. Duplicate ids keep the FIRST
    occurrence (load_wordnet_into_db.py's ON CONFLICT (id) DO NOTHING)."""
    rows = parse_wordnet_xml(xml_path)
    seen: set = set()
    uniq = []
    for r in rows:
        if r["id"] in seen:
            continue
        seen.add(r["id"])
        uniq.append(
            (
                r["id"], r["word"], r["part_of_speech"], r["pronunciations"],
                [(d["pos"], d["gloss"]) for d in r["definitions"]],
                r["examples"], r["synonyms"], r["antonyms"],
                r["similar_words"],
            )
        )
    return spark.createDataFrame(uniq, WORDNET_SCHEMA)
