"""Deterministic mini-OMOP vocabulary + mention lexicon (FIXTURES.md §2-4).

Schemas mirror the reference DDL (reference src/backend/db/seed.sql:14-65)
column-for-column so operator semantics carry over 1:1.  All generation is
seeded and pure — no wall clock, no network.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DateType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

VALID_START = date(1970, 1, 1)
VALID_END = date(2099, 12, 31)

_INGREDIENT_ATC = {
    "metformin": "A10BA02",
    "lisinopril": "C09AA03",
    "atorvastatin": "C10AA05",
    "amlodipine": "C08CA01",
    "omeprazole": "A02BC01",
    "sertraline": "N06AB06",
    "albuterol": "R03AC02",
    "warfarin": "B01AA03",
    "insulin glargine": "A10AE04",
    "levothyroxine": "H03AA01",
}

_CONDITION_MODIFIERS = ["acute", "chronic", "severe", "mild", "recurrent"]
_CONDITION_BASES = [
    "bronchitis", "sinusitis", "gastritis", "dermatitis", "pancreatitis",
    "nephritis", "hepatitis", "arthritis", "tonsillitis", "otitis media",
]
_CONDITION_SPECIFIC = [
    "type 2 diabetes mellitus", "essential hypertension", "atrial fibrillation",
    "chronic kidney disease stage 3", "congestive heart failure",
    "iron deficiency anemia", "migraine without aura", "rheumatoid arthritis",
    "community acquired pneumonia", "deep vein thrombosis",
]
_MEASUREMENTS = [
    "hemoglobin a1c measurement", "serum creatinine level", "blood glucose level",
    "ldl cholesterol measurement", "systolic blood pressure", "body mass index",
    "white blood cell count", "platelet count", "thyroid stimulating hormone level",
    "serum potassium level",
]
_PROCEDURES = [
    "appendectomy", "colonoscopy", "coronary artery bypass graft",
    "total knee replacement", "cataract extraction", "chest x ray",
    "magnetic resonance imaging of brain", "electrocardiogram",
    "influenza vaccination", "physical therapy evaluation",
]
_OBSERVATIONS = [
    "tobacco smoking status", "alcohol use history", "fall risk assessment",
    "body weight observation", "pain severity score",
]
_DEVICES = [
    "cardiac pacemaker device", "insulin pump device", "hearing aid device",
    "wheelchair device", "continuous glucose monitor device",
]
_DOSES = ["10 mg", "20 mg", "500 mg"]
_FORMS = ["oral tablet", "oral capsule"]


@dataclass
class MiniVocab:
    concept_rows: list
    relationship_rows: list
    ancestor_rows: list


def build_mini_vocab(seed: int = 42) -> MiniVocab:
    rng = random.Random(seed)
    concepts = []  # (id, name, domain, vocab, class, standard, code, start, end, invalid)
    relationships = []  # (id1, id2, rel, start, end, invalid)
    ancestors = []  # (anc, desc, min_lvl, max_lvl)
    next_id = [1000]

    def add_concept(name, domain, vocab, cls, standard, code, invalid=None):
        cid = next_id[0]
        next_id[0] += 1
        concepts.append(
            (cid, name, domain, vocab, cls, standard, code, VALID_START, VALID_END, invalid)
        )
        return cid

    # --- ATC hierarchy concepts (non-standard classification vocab)
    atc7_ids = {}
    atc_short_ids = {}
    for ing, atc7 in _INGREDIENT_ATC.items():
        atc7_ids[ing] = add_concept(
            f"{ing} atc class", "Drug", "ATC", "ATC 5th", None, atc7
        )
        short = atc7[:3]
        if short not in atc_short_ids:
            atc_short_ids[short] = add_concept(
                f"atc group {short.lower()}", "Drug", "ATC", "ATC 2nd", None, short
            )

    # --- standard drug concepts (clinical drugs) + box/marketed exclusions
    drug_ids = {}
    snomed_code = 100000
    for ing in _INGREDIENT_ATC:
        for dose in _DOSES:
            for form in _FORMS:
                name = f"{ing} {dose} {form}"
                cid = add_concept(
                    name, "Drug", "RxNorm", "Clinical Drug", "S", str(snomed_code)
                )
                snomed_code += 1
                drug_ids[name] = (cid, ing)
        # embeddable-filter exercise rows (reference embeddings.py:29-30)
        add_concept(
            f"{ing} branded drug box", "Drug", "RxNorm", "Branded Drug Box",
            "S", str(snomed_code),
        )
        snomed_code += 1
        add_concept(
            f"{ing} marketed product", "Drug", "RxNorm", "Marketed Product",
            "S", str(snomed_code),
        )
        snomed_code += 1

    # relationships: drug -> ATC7 concept; alternate relationship ids;
    # sprinkle invalid + ignored rows (reference utils.py:83-84 filters)
    rels = ["Maps to", "RxNorm has ing", "Mapped from"]
    for i, (name, (cid, ing)) in enumerate(sorted(drug_ids.items())):
        rel = rels[i % 3]
        relationships.append((cid, atc7_ids[ing], rel, VALID_START, VALID_END, None))
        if i % 7 == 0:  # invalid rows must be excluded from ATC7 derivation
            relationships.append(
                (cid, atc7_ids[ing], "Maps to", VALID_START, VALID_END, "D")
            )
        if i % 5 == 0:  # non-qualifying relationship id
            relationships.append(
                (cid, atc7_ids[ing], "Is a", VALID_START, VALID_END, None)
            )
        # ancestor path: 7-char ATC ancestor (qualifies) + short (excluded)
        ancestors.append((atc7_ids[ing], cid, 1, 2))
        ancestors.append((atc_short_ids[_INGREDIENT_ATC[ing][:3]], cid, 2, 3))

    # --- standard conditions
    condition_names = list(_CONDITION_SPECIFIC)
    for mod in _CONDITION_MODIFIERS:
        for base in _CONDITION_BASES:
            condition_names.append(f"{mod} {base}")
    for name in condition_names:
        add_concept(name, "Condition", "SNOMED", "Clinical Finding", "S", str(snomed_code))
        snomed_code += 1

    # non-standard clones: must never be retrieved (type=standard filter)
    for name in condition_names[:10]:
        add_concept(
            f"{name} (non standard)", "Condition", "SNOMED", "Clinical Finding",
            "C", str(snomed_code),
        )
        snomed_code += 1

    for name in _MEASUREMENTS:
        add_concept(name, "Measurement", "LOINC", "Lab Test", "S", str(snomed_code))
        snomed_code += 1
    for name in _PROCEDURES:
        add_concept(name, "Procedure", "SNOMED", "Procedure", "S", str(snomed_code))
        snomed_code += 1
    for name in _OBSERVATIONS:
        add_concept(name, "Observation", "SNOMED", "Observable Entity", "S", str(snomed_code))
        snomed_code += 1
    for name in _DEVICES:
        add_concept(name, "Device", "SNOMED", "Physical Object", "S", str(snomed_code))
        snomed_code += 1

    # a few invalidated concepts
    for name in ["obsolete finding alpha", "obsolete finding beta"]:
        add_concept(name, "Condition", "SNOMED", "Clinical Finding", None, str(snomed_code), "U")
        snomed_code += 1

    rng.shuffle(relationships)
    rng.shuffle(ancestors)
    return MiniVocab(concepts, relationships, ancestors)


CONCEPT_SCHEMA = StructType(
    [
        StructField("concept_id", IntegerType(), False),
        StructField("concept_name", StringType(), False),
        StructField("domain_id", StringType(), False),
        StructField("vocabulary_id", StringType(), False),
        StructField("concept_class_id", StringType(), False),
        StructField("standard_concept", StringType(), True),
        StructField("concept_code", StringType(), False),
        StructField("valid_start_date", DateType(), False),
        StructField("valid_end_date", DateType(), False),
        StructField("invalid_reason", StringType(), True),
    ]
)
RELATIONSHIP_SCHEMA = StructType(
    [
        StructField("concept_id_1", IntegerType(), False),
        StructField("concept_id_2", IntegerType(), False),
        StructField("relationship_id", StringType(), False),
        StructField("valid_start_date", DateType(), False),
        StructField("valid_end_date", DateType(), False),
        StructField("invalid_reason", StringType(), True),
    ]
)
ANCESTOR_SCHEMA = StructType(
    [
        StructField("ancestor_concept_id", IntegerType(), False),
        StructField("descendant_concept_id", IntegerType(), False),
        StructField("min_levels_of_separation", IntegerType(), False),
        StructField("max_levels_of_separation", IntegerType(), False),
    ]
)


def vocab_dataframes(
    spark: SparkSession, seed: int = 42
) -> tuple[DataFrame, DataFrame, DataFrame]:
    v = build_mini_vocab(seed)
    return (
        spark.createDataFrame(v.concept_rows, CONCEPT_SCHEMA),
        spark.createDataFrame(v.relationship_rows, RELATIONSHIP_SCHEMA),
        spark.createDataFrame(v.ancestor_rows, ANCESTOR_SCHEMA),
    )


# --------------------------------------------------------------------------
# Mention lexicon (FIXTURES.md §4): surface forms that appear verbatim in
# transcripts; a mix of exact names, reordered variants, typos, ATC-prefixed
# drug mentions, and decoys with no acceptable mapping.
# --------------------------------------------------------------------------

def _reorder(name: str) -> str:
    toks = name.split()
    return " ".join(toks[1:] + toks[:1]) if len(toks) > 1 else name


def _typo(name: str) -> str:
    toks = name.split()
    toks[-1] = toks[-1][:-2] + "x" if len(toks[-1]) > 3 else toks[-1] + "x"
    return " ".join(toks)


def build_lexicon(seed: int = 42) -> list[dict]:
    """Return list of {mention_text, is_drug} entries (deterministic order)."""
    v = build_mini_vocab(seed)
    std_names = {
        (name, domain)
        for (_cid, name, domain, _v, cls, std, *_rest) in v.concept_rows
        if std == "S" and "box" not in cls.lower() and "marketed" not in cls.lower()
    }
    cond = sorted(n for n, d in std_names if d == "Condition")
    meas = sorted(n for n, d in std_names if d == "Measurement")
    proc = sorted(n for n, d in std_names if d == "Procedure")
    drugs = sorted(n for n, d in std_names if d == "Drug")

    lex: list[dict] = []
    # exact matches (accepted, confidence 10)
    for name in cond[:14] + meas[:6] + proc[:6]:
        lex.append({"mention_text": name, "is_drug": False})
    # word-reordered variants (same token set -> confidence 10)
    for name in cond[14:22]:
        lex.append({"mention_text": _reorder(name), "is_drug": False})
    # typo variants (token mismatch -> confidence < 8 -> rejected)
    for name in cond[22:30]:
        lex.append({"mention_text": _typo(name), "is_drug": False})
    # drug mentions with leading ATC7 code (drug path, filtered search)
    atc_prefixed = []
    for ing, atc7 in sorted(_INGREDIENT_ATC.items())[:6]:
        name = f"{ing} 500 mg oral tablet"
        if name in drugs:
            atc_prefixed.append(f"{atc7} {name}")
    for m in atc_prefixed:
        lex.append({"mention_text": m, "is_drug": True})
    # drug mentions WITHOUT code (drug path, unfiltered k=30 — hard part (c))
    for ing in sorted(_INGREDIENT_ATC)[6:]:
        lex.append({"mention_text": f"{ing} 20 mg oral capsule", "is_drug": True})
    # decoys: no acceptable mapping (low token overlap -> rejected)
    decoys = [
        "quantum flux capacitor reading", "astral projection alignment",
        "warp drive coolant pressure", "chrono displacement index",
        "phlogiston saturation panel", "aether vortex calibration",
        "dragon scale density assay", "unicorn horn reflex test",
        "midichlorian count panel", "tachyon emission survey",
    ]
    for d in decoys:
        lex.append({"mention_text": d, "is_drug": False})
    return lex
