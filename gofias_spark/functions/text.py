"""Scalar text functions — SURVEY.md §2.8 X1-X6, X10.

The reference normalizes Russian address strings with an abbreviation table
and regex synonym rules (/root/reference/app/util/prepare.go:28-247). The
Spark re-expression keeps the exact mechanics — prefix vs suffix abbreviation
forms, longest-pattern-first case-insensitive synonym replacement, trim of
" -.," — as JVM column expressions over a config-driven rule table (a small
representative rule set ships as default; deployments extend it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# representative abbreviation rules in the shape of prepare.go:28-182:
# short form -> (full word, placement); prefix => "ул. <name>",
# suffix => "<name> р-н" (placement rules prepare.go:185-199)
DEFAULT_ABBREVS: dict[str, tuple[str, str]] = {
    "ул": ("улица", "prefix"),
    "пр-кт": ("проспект", "prefix"),
    "пер": ("переулок", "prefix"),
    "пл": ("площадь", "prefix"),
    "д": ("дом", "prefix"),
    "стр": ("строение", "prefix"),
    "кор": ("корпус", "prefix"),
    "р-н": ("район", "suffix"),
    "обл": ("область", "suffix"),
    "г": ("город", "prefix"),
    "с": ("село", "prefix"),
    "пос": ("поселок", "prefix"),
}

# synonym regex replacements in the shape of prepare.go:16-22,217-247
# (longest-pattern-first, case-insensitive; utils.go:44-48 sorts by length)
DEFAULT_SYNONYMS: list[tuple[str, str]] = sorted(
    [
        ("городское поселение", "город"),
        ("сельское поселение", "село"),
        ("ё", "е"),
    ],
    key=lambda kv: -len(kv[0]),
)

TRIM_CHARS = " -.,"


def trim_name(col: Column) -> Column:
    """X4: trim the reference's name-punctuation set (jsonAddressDto.go:74-76)."""
    return F.regexp_replace(
        F.regexp_replace(col, r"^[\s\-.,]+", ""), r"[\s\-.,]+$", ""
    )


def prepare_full_name(
    short_col: Column, name_col: Column, abbrevs: dict | None = None
) -> Column:
    """X1 (prepare.go:185-199): '<short>. <name>' for prefix forms,
    '<name> <short>' for suffix forms, passthrough for unknown shorts."""
    abbrevs = abbrevs or DEFAULT_ABBREVS
    short_l = F.lower(trim_name(short_col))
    expr = F.concat_ws(" ", trim_name(short_col), trim_name(name_col))
    for short, (_full, placement) in abbrevs.items():
        if placement == "prefix":
            formed = F.concat(F.lit(f"{short}. "), trim_name(name_col))
        else:
            formed = F.concat(trim_name(name_col), F.lit(f" {short}"))
        expr = F.when(short_l == short, formed).otherwise(expr)
    return expr


def prepare_suggest(
    suggest_col: Column,
    short_col: Column,
    name_col: Column,
    abbrevs: dict | None = None,
) -> Column:
    """X2 (prepare.go:202-214): append '<full> <short>. <name>' (abbrev
    expanded), lowercase, trimmed."""
    abbrevs = abbrevs or DEFAULT_ABBREVS
    short_l = F.lower(trim_name(short_col))
    full = short_l
    for short, (full_word, _placement) in abbrevs.items():
        full = F.when(short_l == short, F.lit(full_word)).otherwise(full)
    piece = F.lower(
        F.concat_ws(
            " ", full, F.concat(short_l, F.lit(".")), trim_name(name_col)
        )
    )
    return F.trim(F.concat_ws(" ", F.coalesce(suggest_col, F.lit("")), piece))


def replace_synonyms(
    col: Column, synonyms: list[tuple[str, str]] | None = None
) -> Column:
    """X3 (prepare.go:16-22,217-247): case-insensitive regex replacement,
    longest pattern first."""
    out = col
    for pat, repl in synonyms or DEFAULT_SYNONYMS:
        out = F.regexp_replace(out, f"(?i){pat}", repl)
    return out


def house_display(
    num_col: Column, struct_col: Column, building_col: Column
) -> Column:
    """X5 (jsonHouseDto.go:46-67): 'д. N[, стр. S][, кор. B]'."""
    return F.concat(
        F.lit("д. "),
        num_col,
        F.when(
            struct_col.isNotNull() & (struct_col != ""),
            F.concat(F.lit(", стр. "), struct_col),
        ).otherwise(F.lit("")),
        F.when(
            building_col.isNotNull() & (building_col != ""),
            F.concat(F.lit(", кор. "), building_col),
        ).otherwise(F.lit("")),
    )


def address_path_concat(parent_full: Column, own: Column) -> Column:
    """X6 (elasticAddressRepository.go:908-915): hierarchical path concat."""
    return F.when(
        parent_full.isNotNull() & (parent_full != ""),
        F.concat_ws(", ", parent_full, own),
    ).otherwise(own)
