"""Deterministic GCD-shaped micro-dump synthesis (FIXTURES.md §2).

Generates the 13 input tables the reference reads
(reference Main.java:134-216, GcdMetadata.java:58-72,
GcdStoryCredit.java:115-119) as small pandas frames with every edge
case the scalar semantics of SURVEY.md §2.8 need exercised:
malformed dates, non-numeric issue numbers, messy semicolon lists,
dangling foreign keys, dictionary misses, null timestamps, pre-epoch
timestamps, story-less issues and high-fan-out issues, stories with
and without curated credits, composite credit types.

Everything is seeded — same seed, same bytes — so the golden test
(tests/test_gcd_pipeline.py) is reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_ISSUE = 1000
N_SERIES = 100
N_PUBLISHER = 20
N_INDICIA = 30
N_BRAND = 15
N_STORY = 3000
N_CREDIT = 2000
N_NAME_DETAIL = 150
N_CREATOR = 100


def _pick(rng: np.random.RandomState, options: list, n: int) -> list:
    return [options[i] for i in rng.randint(0, len(options), n)]


def _timestamps(rng: np.random.RandomState, n: int) -> pd.Series:
    """Post-1990 timestamps with ~8% nulls and a sprinkle of pre-1970
    values (epoch<=0 -> -1 sentinel path, reference Main.java:644)."""
    base = pd.Timestamp("1995-01-01").value // 10**9
    secs = base + rng.randint(0, 25 * 365 * 86400, n)
    ts = pd.Series(pd.to_datetime(secs, unit="s")).astype("datetime64[us]")
    null_mask = rng.rand(n) < 0.08
    ts[null_mask] = pd.NaT
    pre_epoch = (~null_mask) & (rng.rand(n) < 0.02)
    ts[pre_epoch] = pd.Timestamp("1965-05-05")
    return ts


def generate_microdump(seed: int = 42) -> dict[str, pd.DataFrame]:
    rng = np.random.RandomState(seed)

    country = pd.DataFrame(
        {"id": pd.array(range(1, 11), dtype="int32"),
         "code": [f"c{i:02d}" for i in range(1, 11)]}
    )
    language = pd.DataFrame(
        {"id": pd.array(range(1, 11), dtype="int32"),
         "code": [f"l{i:02d}" for i in range(1, 11)]}
    )
    pubtype = pd.DataFrame(
        {"id": pd.array(range(1, 6), dtype="int32"),
         "name": [f"pubtype {i}" for i in range(1, 6)]}
    )
    storytype = pd.DataFrame(
        {"id": pd.array(range(1, 11), dtype="int32"),
         "name": [f"storytype {i}" for i in range(1, 11)]}
    )

    creator = pd.DataFrame(
        {"id": np.arange(1, N_CREATOR + 1, dtype="int64"),
         "gcd_official_name": [f"Creator {i}" for i in range(1, N_CREATOR + 1)]}
    )
    name_detail = pd.DataFrame(
        {"id": np.arange(1, N_NAME_DETAIL + 1, dtype="int64"),
         "creator_id": rng.randint(1, N_CREATOR + 1, N_NAME_DETAIL).astype("int64")}
    )

    publisher = pd.DataFrame(
        {
            "id": np.arange(1, N_PUBLISHER + 1, dtype="int64"),
            "name": [f"Publisher {i}" for i in range(1, N_PUBLISHER + 1)],
            # ids 11/12 miss the country dictionary (map-miss -> null)
            "country_id": pd.array(rng.randint(1, 13, N_PUBLISHER), dtype="int32"),
            "url": _pick(rng, ["http://pub.example/x", None, ""], N_PUBLISHER),
            "created": _timestamps(rng, N_PUBLISHER),
            "modified": _timestamps(rng, N_PUBLISHER),
        }
    )
    indicia = pd.DataFrame(
        {
            "id": np.arange(1, N_INDICIA + 1, dtype="int64"),
            "name": [f"Indicia {i}" for i in range(1, N_INDICIA + 1)],
            "country_id": pd.array(rng.randint(1, 13, N_INDICIA), dtype="int32"),
            "parent_id": rng.randint(1, N_PUBLISHER + 1, N_INDICIA).astype("int64"),
            "year_began": pd.array(rng.randint(1930, 2020, N_INDICIA), dtype="int32"),
            "year_ended": pd.array(
                [None if rng.rand() < 0.4 else int(y) for y in rng.randint(1940, 2024, N_INDICIA)],
                dtype="Int32",
            ),
            "is_surrogate": pd.array(rng.randint(0, 2, N_INDICIA), dtype="int32"),
            "url": _pick(rng, ["http://ind.example", None], N_INDICIA),
            "created": _timestamps(rng, N_INDICIA),
            "modified": _timestamps(rng, N_INDICIA),
        }
    )
    brand = pd.DataFrame(
        {
            "id": np.arange(1, N_BRAND + 1, dtype="int64"),
            "name": [f"Brand {i}" for i in range(1, N_BRAND + 1)],
            "url": _pick(rng, ["http://brand.example", None], N_BRAND),
            "created": _timestamps(rng, N_BRAND),
            "modified": _timestamps(rng, N_BRAND),
        }
    )

    series = pd.DataFrame(
        {
            "id": np.arange(1, N_SERIES + 1, dtype="int64"),
            "name": [f"Series {i}" for i in range(1, N_SERIES + 1)],
            "year_began": pd.array(rng.randint(1930, 2020, N_SERIES), dtype="int32"),
            "year_ended": pd.array(
                [None if rng.rand() < 0.3 else int(y) for y in rng.randint(1940, 2024, N_SERIES)],
                dtype="Int32",
            ),
            "is_current": pd.array(rng.randint(0, 2, N_SERIES), dtype="int32"),
            "country_id": pd.array(rng.randint(1, 13, N_SERIES), dtype="int32"),
            "language_id": pd.array(rng.randint(1, 13, N_SERIES), dtype="int32"),
            "has_gallery": pd.array(rng.randint(0, 2, N_SERIES), dtype="int32"),
            "is_comics_publication": pd.array(rng.randint(0, 2, N_SERIES), dtype="int32"),
            "color": _pick(rng, ["color", "b&w", None, ""], N_SERIES),
            "dimensions": _pick(rng, ["standard", "17x26cm", None], N_SERIES),
            "paper_stock": _pick(rng, ["glossy", "newsprint", None], N_SERIES),
            "binding": _pick(rng, ["saddle; glue ;", "hardcover", "perfect ;; bound", None, ""], N_SERIES),
            "publishing_format": _pick(rng, ["ongoing", "limited", None], N_SERIES),
            # id 6 misses the 5-row pubtype dictionary
            "publication_type_id": pd.array(
                [None if rng.rand() < 0.2 else int(v) for v in rng.randint(1, 7, N_SERIES)],
                dtype="Int32",
            ),
            "is_singleton": pd.array(rng.randint(0, 2, N_SERIES), dtype="int32"),
            "created": _timestamps(rng, N_SERIES),
            "modified": _timestamps(rng, N_SERIES),
            "publisher_id": rng.randint(1, N_PUBLISHER + 1, N_SERIES).astype("int64"),
        }
    )

    issue = pd.DataFrame(
        {
            "id": np.arange(1, N_ISSUE + 1, dtype="int64"),
            "number": _pick(
                rng,
                ["1", "42", "0042", " 7 ", "Annual 1", "", None, "12a", "300"],
                N_ISSUE,
            ),
            "key_date": _pick(
                rng,
                ["1987-03-01", "1987-00-00", "", None, "1987-3-1", "2001-12-31 x", "2020-11-30"],
                N_ISSUE,
            ),
            "price": _pick(
                rng,
                ["2.50 USD; 3.00 CAD ;", "free", "", None, "1.00 USD ;; 2.00 CAD", "0.10 USD"],
                N_ISSUE,
            ),
            "page_count": pd.array(
                [None if rng.rand() < 0.15 else int(v) for v in rng.randint(8, 200, N_ISSUE)],
                dtype="Int32",
            ),
            "indicia_frequency": _pick(rng, ["monthly", "bi-monthly", None, ""], N_ISSUE),
            "isbn": _pick(rng, ["978-0-00-000000-0", None, ""], N_ISSUE),
            "variant_name": _pick(rng, ["newsstand", None, ""], N_ISSUE),
            "variant_of_id": pd.array(
                [None if rng.rand() < 0.8 else int(v) for v in rng.randint(1, N_ISSUE + 1, N_ISSUE)],
                dtype="Int64",
            ),
            "barcode": _pick(rng, ["07612345678900111", None, ""], N_ISSUE),
            "title": [f"Issue title {i}" if i % 7 else None for i in range(1, N_ISSUE + 1)],
            "on_sale_date": _pick(
                rng, ["1987-02-15", "1987-13-99", "", None, "2020-01-05"], N_ISSUE
            ),
            "rating": _pick(rng, ["T+", None, ""], N_ISSUE),
            "volume_not_printed": pd.array(
                [None if rng.rand() < 0.1 else int(v) for v in rng.randint(0, 2, N_ISSUE)],
                dtype="Int32",
            ),
            "editing": _pick(rng, ["Ed One; Ed Two", "", None, "Solo Ed ; ", "A ;; B"], N_ISSUE),
            "notes": _pick(rng, ["some notes", None, ""], N_ISSUE),
            "created": _timestamps(rng, N_ISSUE),
            "modified": _timestamps(rng, N_ISSUE),
            "series_id": rng.randint(1, N_SERIES + 1, N_ISSUE).astype("int64"),
            # ids 31-33 dangle (left-join miss); ~30% null
            "indicia_publisher_id": pd.array(
                [None if rng.rand() < 0.3 else int(v) for v in rng.randint(1, 34, N_ISSUE)],
                dtype="Int64",
            ),
            "brand_id": pd.array(
                [None if rng.rand() < 0.4 else int(v) for v in rng.randint(1, 18, N_ISSUE)],
                dtype="Int64",
            ),
        }
    )

    # Stories: issues 801..1000 have none (null story subtree); issue 1
    # gets 10 (fan-out). Legacy credit strings exercise F12 fallback.
    story_issue = np.concatenate(
        [np.full(10, 1, dtype="int64"), rng.randint(1, 801, N_STORY - 10).astype("int64")]
    )
    legacy = ["Name A; Name B", "?", "", None, "typeset ;", "X ; Y ; Z"]
    story = pd.DataFrame(
        {
            "id": np.arange(1, N_STORY + 1, dtype="int64"),
            "issue_id": story_issue,
            "title": _pick(rng, ["story t", "", None], N_STORY),
            "feature": _pick(rng, ["feature x", None, ""], N_STORY),
            "sequence_number": pd.array(
                [None if rng.rand() < 0.05 else int(v) for v in rng.randint(0, 30, N_STORY)],
                dtype="Int32",
            ),
            "page_count": pd.array(
                [None if rng.rand() < 0.2 else int(v) for v in rng.randint(1, 60, N_STORY)],
                dtype="Int32",
            ),
            "script": _pick(rng, legacy, N_STORY),
            "pencils": _pick(rng, legacy, N_STORY),
            "inks": _pick(rng, legacy, N_STORY),
            "colors": _pick(rng, legacy, N_STORY),
            "letters": _pick(rng, legacy, N_STORY),
            "editing": _pick(rng, legacy, N_STORY),
            "genre": _pick(rng, ["superhero; adventure", "humor", None, ""], N_STORY),
            "characters": _pick(rng, ["Hero One; Hero Two ;", "Solo", None, ""], N_STORY),
            # ids 11/12 miss the 10-row storytype dictionary
            "type_id": pd.array(rng.randint(1, 13, N_STORY), dtype="int32"),
            "job_number": _pick(rng, ["J-100", None, ""], N_STORY),
            "first_line": _pick(rng, ["It was a dark...", None, ""], N_STORY),
            "created": _timestamps(rng, N_STORY),
            "modified": _timestamps(rng, N_STORY),
        }
    )

    # Credits: stories 1..1500 may have curated credits (the rest fall
    # back to legacy); composite types 7-13 exercise F10 expansion;
    # creator_ids 151-155 dangle (inner-join drop).
    credit = pd.DataFrame(
        {
            "id": np.arange(1, N_CREDIT + 1, dtype="int64"),
            "story_id": rng.randint(1, 1501, N_CREDIT).astype("int64"),
            "credit_type_id": pd.array(rng.randint(1, 14, N_CREDIT), dtype="int32"),
            "creator_id": rng.randint(1, 156, N_CREDIT).astype("int64"),
        }
    )

    return {
        "gcd_issue": issue,
        "gcd_series": series,
        "gcd_publisher": publisher,
        "gcd_indicia_publisher": indicia,
        "gcd_brand": brand,
        "gcd_story": story,
        "gcd_story_credit": credit,
        "gcd_creator_name_detail": name_detail,
        "gcd_creator": creator,
        "stddata_country": country,
        "stddata_language": language,
        "gcd_series_publication_type": pubtype,
        "gcd_story_type": storytype,
    }


def write_microdump(out_dir: str, seed: int = 42) -> dict[str, str]:
    """Write each table as one parquet file; returns name -> path."""
    import os

    paths = {}
    for name, df in generate_microdump(seed).items():
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
