"""The GDP ETL pipeline as composable ``DataFrame → DataFrame`` stages.

Mirrors the reference dataflow (``gpd_etl_pipeline.R:560-571``)::

    melt/union sources                 (get_unsd_gdp_data / taiwan)
     └→ remap_dissolved_economies      (:149-221, C1×10 + A1)
     └→ estimate_last_year             (:275-317)
     └→ round_values                   (:319-323, banker's)
     └→ filter_valid_range             (:325-334, J4+F2)
     └→ add_labels                     (:336-345)
     └→ compute_aggregates             (:347-413, J7+J8+A2)
     └→ add_comments                   (:415-518, C11+C1×7)
     └→ export_generic_csv / export_usis_layout (:520-558)

Everything stays lazy until a sink; dimensions are broadcast; business
rules are **data**, not code — the remap and comment rule tables below
are transcriptions of the reference's constants so they can be audited,
tested and replaced wholesale.

Canonical fact schema (reference §1.1):
``Economy_Code string (zero-padded), Year int, Variable string,
Value double``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import (
    bankers_round,
    conditional_overwrite,
    recode,
    ref_date,
    sum_na_zero,
)
from ..operators.closure import transitive_closure

CONSTANT = "GDP_at_constant_prices_2015"
CURRENT = "GDP_at_current_prices"

# ---------------------------------------------------------------------------
# business-rule tables (transcribed from the reference; codes are DATA)
# ---------------------------------------------------------------------------

#: dissolved/renamed-economy remaps (``gpd_etl_pipeline.R:153-214``):
#: (member_codes, (year_from, year_to), successor_code)
REMAP_RULES: list[tuple[list[str], tuple[int, int], str]] = [
    (["835", "836"], (1970, 2023), "834"),  # Tanzania Mainland+Zanzibar -> URT
    (["203", "703"], (1991, 1992), "200"),  # Czechia+Slovakia -> Czechoslovakia
    (["728", "729"], (2011, 2011), "736"),  # South Sudan+Sudan -> Former Sudan
    (["688", "499"], (1992, 1998), "891"),  # Serbia+Montenegro
    (["688", "499", "412"], (1999, 2007), "891"),  # + Kosovo
    (["688", "499", "191", "807", "705", "070"], (1991, 1991), "890"),  # Yugoslavia
    (
        ["643", "804", "112", "860", "398", "268", "031", "440",
         "498", "428", "417", "762", "051", "795", "233"],
        (1991, 1991),
        "810",
    ),  # USSR
    (["583", "584", "585"], (1970, 1981), "582"),  # Pacific Islands Trust Ter.
    (["276"], (1970, 1989), "280"),  # Federal Republic of Germany
    (["360"], (1970, 2002), "960"),  # Indonesia (..2002)
    (["591"], (1970, 1980), "590"),  # Panama, excl. Canal Zone
]

#: comment rules (``gpd_etl_pipeline.R:417-518``): (code, year range or
#: None, CommentEN, CommentFR).  Rules 8-10 are commented out in the
#: reference and therefore absent here.
COMMENT_RULES: list[tuple[str, tuple[int, int] | None, str, str]] = [
    ("834", None,
     "Tanzania Mainland 835 + Zanzibar 836",
     "Tanzanie continentale 835 + Zanzibar 836"),
    ("200", (1991, 1992),
     "Czechia 203 + Slovakia 703",
     "Tchéquie 203 + Slovaquie 703"),
    ("736", (2011, 2011),
     "South Sudan 728 + Sudan 729",
     "Soudan du Sud 728 + Soudan 729"),
    ("891", (1992, 1998),
     "Serbia 688 + Montenegro 499",
     "Serbie 688 + Monténégro 499"),
    ("891", (1999, 2007),
     "Serbia 688 + Montenegro 499 + Kosovo 412",
     "Serbie 688 + Monténégro 499 + Kosovo 412"),
    ("890", (1991, 1991),
     "Serbia 688 + Montenegro 499 + Croatia 191 + North Macedonia 807 "
     "+ Slovenia 705 + Bosnia and Herzegovina 070",
     "Serbie 688 + Monténégro 499 + Croatie 191 + Macédoine du Nord 807 "
     "+ Slovénie 705 + Bosnie-Herzégovine 070"),
    ("810", (1991, 1991),
     "Russian Federation 643 + Ukraine 804 + Belarus 112 + Uzbekistan 860 "
     "+ Kazakhstan 398 + Georgia 268 + Azerbaijan 031 + Lithuania 440 "
     "+ Moldova 498 + Latvia 428 + Kyrgyzstan 417 + Tajikistan 762 "
     "+ Armenia 051 + Turkmenistan 795 + Estonia 233",
     "Fédération de Russie 643 + Ukraine 804 + Bélarus 112 + Ouzbékistan 860 "
     "+ Kazakhstan 398 + Géorgie 268 + Azerbaïdjan 031 + Lituanie 440 "
     "+ République de Moldova 498 + Lettonie 428 + Kirghistan 417 "
     "+ Tadjikistan 762 + Arménie 051 + Turkménistan 795 + Estonie 233"),
    ("582", (1970, 1981),
     "Micronesia 583 + Marshall Islands 584 + Palau 585",
     "Micronésie (États fédérés de) 583 + Îles Marshall 584 + Palaos 585"),
]

#: growth-rate feed country-code aliases (``gpd_etl_pipeline.R:285-292``)
GROWTH_CODE_ALIASES = {"842": "840", "926": "826", "757": "756",
                       "251": "250", "579": "578"}

#: economies whose deflator is CPI-derived because the USIS deflator
#: feed lacks them (``gpd_etl_pipeline.R:225-228``)
MISSING_DEFLATOR_ECONOMIES = (
    "004", "060", "092", "136", "184",
    "192", "232", "258", "275", "304",
    "500", "531", "534", "540", "660",
    "760", "796",
)

#: Variable -> USIS measure codes (``gpd_etl_pipeline.R:534-538``)
MEASURE_CODES = {CURRENT: "0100", CONSTANT: "0940"}


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def melt_wide_gdp(wide: DataFrame, id_cols: list[str], value_name: str) -> DataFrame:
    """R1: melt year columns of a wide UNSD-style frame into
    (Year, value) rows (``gpd_etl_pipeline.R:57,63``)."""
    year_cols = [c for c in wide.columns if c not in id_cols]
    long = wide.unpivot(id_cols, year_cols, "Year", value_name)
    return long.withColumn("Year", F.col("Year").cast("int"))


def get_unsd_gdp_data(
    constant_wide: DataFrame,
    current_wide: DataFrame,
    country_col: str = "CountryID",
    indicator_col: str = "IndicatorName",
    indicator: str = "Gross Domestic Product (GDP)",
) -> DataFrame:
    """The reference's first named extraction stage
    (``gpd_etl_pipeline.R:51-88``): two wide UNSD AMA workbooks (one
    year column per year) → the canonical long fact.

    Per source: keep the GDP indicator rows, melt year columns; then
    INNER join the two measures on (country, year) — a year present in
    only one workbook is dropped, exactly the reference's
    ``inner_join`` at ``:69`` — melt the two measures into
    ``Variable``/``Value`` rows (NA values are KEPT, matching
    ``pivot_longer``'s default; downstream ``sum_na_zero`` depends on
    seeing them), and zero-pad the numeric country id to the 3-char
    ``Economy_Code``.

    The frames are injected, not fetched: the network/Excel read is
    ``sources.read_excel``/``read_usis_csv``'s job, so this stage —
    and its tests/oracle — run identically on any engine and sandbox.

    Scale shape: melt is a JVM expression fan-out (no shuffle); the
    measure join keys on (country, year) — one co-partitioned shuffle
    of two already-skinny frames; everything after is map work.
    """

    def one(wide: DataFrame, value_name: str) -> DataFrame:
        id_cols = list(wide.columns[:3])
        kept = wide.filter(F.col(indicator_col) == indicator)
        return melt_wide_gdp(kept, id_cols, value_name).select(
            F.col(country_col).alias("__cid"), "Year", value_name
        )

    joined = one(constant_wide, CONSTANT).join(
        one(current_wide, CURRENT), ["__cid", "Year"], "inner"
    )
    return (
        joined.unpivot(
            ["__cid", "Year"], [CONSTANT, CURRENT], "Variable", "Value"
        )
        .select(
            F.lpad(F.col("__cid").cast("string"), 3, "0").alias("Economy_Code"),
            F.col("Year").cast("int").alias("Year"),
            "Variable",
            "Value",
        )
    )


def get_taiwan_gdp_data(
    fact: DataFrame,
    principal: DataFrame,
    expend_pre81: DataFrame,
    expend_post81: DataFrame,
    base_year: int = 2015,
) -> DataFrame:
    """The reference's Taiwan NSO stage (``gpd_etl_pipeline.R:90-147``):
    three feeds (already read/trimmed — ``sources.read_csv_trimmed``
    handles the preamble/footer/``--`` contract) → economy ``158`` rows
    appended to ``fact``.

    Expected canonical columns (renames of the NSO headers):

    * ``principal``: ``Period int, GDP_NTD_Current double,
      GDP_USD_Current double`` (the reference's ``GDP (Million
      N.T.$,at Current Prices)`` / ``(Million U.S.$ ...)``);
    * ``expend_pre81`` / ``expend_post81``: ``Period int, Expenditure
      string, Current_NTD double, Chained_NTD double`` (``At Current
      Prices`` / ``Chained (2021) Dollars``).

    Semantics pinned from the reference:

    * the W2 **rebase factor** — the post-81 feed's ``8. GDP`` row at
      ``base_year``: ``Current_NTD / Chained_NTD`` (``:121-124``) —
      rebases the chained-2021 series to 2015 prices, so Taiwan's 2015
      constant-price value equals its 2015 current-price value;
    * the A3 **base-year FX scalar**: constant prices convert at the
      ``base_year`` exchange rate for ALL years (``:135``), current
      prices at each year's own rate (``:137``);
    * the exchange rate itself is NT$/US$ from the principal feed
      (``:133``); GDP unit is million NT$ → ``* 1e6``.

    Scale shape: the three NSO feeds are one-row-per-year minutiae —
    every derived scalar (rebase factor, base FX) is a 1-row broadcast
    cross join (never ``.first()``/collect: the plan stays lazy and
    cluster-side), and the per-year FX join broadcasts.  The union with
    the planet-scale ``fact`` is by-name and shuffle-free.
    """
    fx = principal.select(
        "Period",
        (F.col("GDP_NTD_Current") / F.col("GDP_USD_Current")).alias("__fx"),
    )
    # Guarded 1-row scalars: a bare filter->crossJoin would silently
    # ANNIHILATE every Taiwan row when the base-year row is missing and
    # silently DUPLICATE the series when two base rows exist.  The
    # reference errors in both cases (a 0- or 2-length vector inside
    # mutate); aggregating to exactly one row and raise_error-ing on a
    # bad count reproduces that, lazily and executor-side.
    base_fx = fx.filter(F.col("Period") == base_year).agg(
        F.count(F.lit(1)).alias("__n_fx"),
        F.max("__fx").alias("__fx_base"),
    )
    rebase = (
        expend_post81.filter(
            (F.col("Period") == base_year) & (F.col("Expenditure") == "8. GDP")
        )
        .agg(
            F.count(F.lit(1)).alias("__n_rb"),
            F.max(
                F.col("Current_NTD") / F.col("Chained_NTD")
            ).alias("__rebase"),
        )
    )
    guard = F.when(
        (F.col("__n_fx") == 1) & (F.col("__n_rb") == 1), F.lit(1)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "get_taiwan_gdp_data: need exactly one base-year row, "
                "got %s FX rows and %s '8. GDP' rows for year "
                f"{base_year}",
                F.col("__n_fx").cast("string"),
                F.col("__n_rb").cast("string"),
            )
        )
    )
    nso = (
        expend_pre81.unionByName(expend_post81)
        # the pre-81 feed labels GDP "6.GDP" (sic, no space), post-81
        # "8. GDP" (``:130``)
        .filter(F.col("Expenditure").isin("6.GDP", "8. GDP"))
        .join(F.broadcast(fx), "Period", "left")
        .crossJoin(F.broadcast(base_fx))
        .crossJoin(F.broadcast(rebase))
        # a FILTER (not an unused projection, which column pruning
        # would silently eliminate) forces the guard to evaluate
        .filter(guard == F.lit(1))
        .drop("__n_fx", "__n_rb")
    )
    taiwan = (
        nso.select(
            F.col("Period"),
            (
                F.col("Chained_NTD") * F.lit(1e6) / F.col("__fx_base")
                * F.col("__rebase")
            ).alias(CONSTANT),
            (F.col("Current_NTD") * F.lit(1e6) / F.col("__fx")).alias(CURRENT),
        )
        .unpivot(["Period"], [CONSTANT, CURRENT], "Variable", "Value")
        .select(
            F.lit("158").alias("Economy_Code"),
            F.col("Period").cast("int").alias("Year"),
            "Variable",
            "Value",
        )
    )
    return fact.unionByName(taiwan)


def get_gdp_deflators(
    cpi: DataFrame,
    gdp_deflators: DataFrame,
    exchange_rates: DataFrame,
    missing_economies: tuple[str, ...] = MISSING_DEFLATOR_ECONOMIES,
    target_year: int = 2024,
    base_year: int = 2015,
) -> DataFrame:
    """The reference's deflator stage (``gpd_etl_pipeline.R:223-273``):
    three USIS feeds (``Country_Code, Country_Label, Year, Value``) →
    ``(Country_Code, Year, Deflator_USD)``.

    * CPI branch (``:231-244``): for the economies missing from the
      deflator feed, rebase CPI to ``base_year`` = 100 (W1 guard: the
      base value applies only when exactly ONE base-year row exists per
      economy) and keep the ``target_year`` row;
    * deflator branch (``:248-265``): national-currency deflator / FX
      (S2×2 left join), rebased to ``base_year`` the same way — USD
      deflator for every year;
    * union + ``na.omit`` (``:267-271``): any row with a NULL (no FX,
      no base-year value, NA input) drops.

    Scale shape: both rebases are ONE window shuffle per branch
    (``base_value_broadcast``); the FX join co-partitions on
    (country, year).
    """
    from ..operators.windows import base_value_broadcast

    c = (
        cpi.select("Country_Code", "Country_Label", "Year", "Value")
        .filter(F.col("Country_Code").isin(*missing_economies))
    )
    c = base_value_broadcast(
        c, ["Country_Label"], "Year", "Value", base_year, "__v_base"
    )
    cpi_out = (
        c.withColumn(
            "Deflator_USD",
            F.lit(100.0) * F.col("Value") / F.col("__v_base"),
        )
        .filter(F.col("Year") == target_year)
        .select("Country_Code", "Year", "Deflator_USD")
    )
    fx = exchange_rates.select(
        "Country_Code", "Year", F.col("Value").alias("__fx")
    )
    d = (
        gdp_deflators.select("Country_Code", "Country_Label", "Year", "Value")
        .join(fx, ["Country_Code", "Year"], "left")
        .withColumn("Deflator_exg", F.col("Value") / F.col("__fx"))
    )
    d = base_value_broadcast(
        d, ["Country_Label"], "Year", "Deflator_exg", base_year, "__d_base"
    )
    defl_out = d.withColumn(
        "Deflator_USD",
        F.lit(100.0) * F.col("Deflator_exg") / F.col("__d_base"),
    ).select("Country_Code", "Year", "Deflator_USD")
    return cpi_out.unionByName(defl_out).dropna()


def build_fact(
    unsd_constant_wide: DataFrame,
    unsd_current_wide: DataFrame,
    taiwan_principal: DataFrame,
    taiwan_expend_pre81: DataFrame,
    taiwan_expend_post81: DataFrame,
    base_year: int = 2015,
) -> DataFrame:
    """§3.1 end-to-end extraction composition: the canonical fact the
    reference assembles before any transform —
    ``get_unsd_gdp_data() |> get_taiwan_gdp_data()``
    (``gpd_etl_pipeline.R:561-562``).  Feed the result to
    :func:`run_pipeline`."""
    return get_taiwan_gdp_data(
        get_unsd_gdp_data(unsd_constant_wide, unsd_current_wide),
        taiwan_principal,
        taiwan_expend_pre81,
        taiwan_expend_post81,
        base_year=base_year,
    )


def remap_dissolved_economies(df: DataFrame) -> DataFrame:
    """C1×10 + A1 (``gpd_etl_pipeline.R:149-221``): rewrite member-economy
    codes onto their dissolved successor for the covered years, then
    group-sum the parts.  All-NULL groups sum to 0 (R ``na.rm=TRUE``)."""
    rules = [
        (
            F.col("Economy_Code").isin(codes) & F.col("Year").between(y0, y1),
            F.lit(target),
        )
        for codes, (y0, y1), target in REMAP_RULES
    ]
    remapped = df.withColumn(
        "Economy_Code", conditional_overwrite(F.col("Economy_Code"), rules)
    )
    return (
        remapped.groupBy("Economy_Code", "Year", "Variable")
        .agg(sum_na_zero("Value").alias("Value"))
    )


def estimate_last_year(
    df: DataFrame,
    growth_rates: DataFrame,
    deflators: DataFrame,
    last_year: int,
    skip_estimation: bool = False,
) -> DataFrame:
    """``gpd_etl_pipeline.R:275-317``: extrapolate constant-price GDP one
    year with growth rates, then derive current prices via deflators.

    ``growth_rates``: (UNCTcc string, growth_pct double) — aliases from
    :data:`GROWTH_CODE_ALIASES` applied here.
    ``deflators``: (Country_Code string, Year int, Deflator_USD double).
    """
    if skip_estimation:
        return df
    growth = growth_rates.withColumn(
        "UNCTcc", recode(F.col("UNCTcc"), GROWTH_CODE_ALIASES)
    )
    base = df.filter(
        (F.col("Year") == last_year - 1) & (F.col("Variable") == CONSTANT)
    )
    est_constant = (
        base.join(
            F.broadcast(growth), base["Economy_Code"] == growth["UNCTcc"], "left"
        )
        .select(
            "Economy_Code",
            F.lit(last_year).alias("Year"),
            F.col("Variable"),
            (F.col("Value") * (F.lit(1.0) + F.col("growth_pct") / F.lit(100.0))).alias(
                "Value"
            ),
        )
    )
    defl = deflators.select(
        F.col("Country_Code"), F.col("Year").alias("__dy"), F.col("Deflator_USD")
    )
    est_current = (
        est_constant.join(
            F.broadcast(defl),
            (est_constant["Economy_Code"] == defl["Country_Code"])
            & (est_constant["Year"] == defl["__dy"]),
            "left",
        )
        .select(
            "Economy_Code",
            "Year",
            F.lit(CURRENT).alias("Variable"),
            (F.col("Value") * F.col("Deflator_USD") / F.lit(100.0)).alias("Value"),
        )
    )
    return df.unionByName(est_constant).unionByName(est_current)


def round_values(df: DataFrame) -> DataFrame:
    """C7 (``gpd_etl_pipeline.R:319-323``): banker's rounding — R
    ``round()`` is half-to-even, so ``bround``, never ``round``."""
    return df.withColumn("Value", bankers_round(F.col("Value"), 0))


def filter_valid_range(df: DataFrame, dim_countries: DataFrame) -> DataFrame:
    """J4 + F2 + P2 (``gpd_etl_pipeline.R:325-334``): keep rows inside
    the economy's validity band.  Inner-band semantics: the reference's
    ``filter(between(...))`` drops unmatched codes too (NULL ValidFrom
    fails the predicate)."""
    dim = dim_countries.select("Code", "ValidFrom", "ValidTo")
    return (
        df.join(F.broadcast(dim), df["Economy_Code"] == dim["Code"], "left")
        .filter(F.col("Year").between(F.col("ValidFrom"), F.col("ValidTo")))
        .drop("Code", "ValidFrom", "ValidTo")
    )


def add_labels(df: DataFrame, labels: DataFrame) -> DataFrame:
    """J4 + P5 + P3 (``gpd_etl_pipeline.R:336-345``)."""
    lab = labels.select("Code", F.col("Label").alias("Economy_Label"))
    rest = [c for c in df.columns if c != "Economy_Code"]
    return (
        df.join(F.broadcast(lab), df["Economy_Code"] == lab["Code"], "left")
        .drop("Code")
        .select("Economy_Code", "Economy_Label", *rest)
    )


def compute_aggregates(df: DataFrame, economy_groups: DataFrame) -> DataFrame:
    """J7 + J8 + A2 (``gpd_etl_pipeline.R:347-413``): expand the
    multi-level hierarchy to (group, leaf-member) pairs, fan the fact out
    over membership, sum per (group, Year, Variable), union back onto
    the fact.  "World" gets code ``0000`` (reference ``:404-407``).

    ``economy_groups``: either the reference's full 10-column hierarchy
    contract (``Parent_*``/``Child_*`` with ``Child_IsTarget``) — routed
    through :func:`operators.hierarchy.reference_rollup`, whose
    replace-and-filter semantics reproduce the published group rows
    bit-exactly on the real ``Dim_Countries_Hierarchy_All.csv`` — or a
    plain edge list with ``Parent_Code, Parent_Label, Child_Code``,
    expanded by the generic leaf closure."""
    if "Child_IsTarget" in economy_groups.columns:
        from ..operators.hierarchy import reference_rollup

        groupgdp = reference_rollup(df, economy_groups)
        return df.unionByName(groupgdp, allowMissingColumns=False).orderBy(
            "Economy_Code", "Year", "Variable"
        )
    edges = economy_groups.select(
        F.col("Parent_Code").alias("parent"), F.col("Child_Code").alias("child")
    )
    closure = transitive_closure(edges, "parent", "child")
    parent_labels = economy_groups.select(
        F.col("Parent_Code").alias("parent"), F.col("Parent_Label")
    ).distinct()
    fanned = df.join(
        F.broadcast(closure), df["Economy_Code"] == closure["child"], "inner"
    )
    groupgdp = (
        fanned.groupBy("parent", "Year", "Variable")
        .agg(sum_na_zero("Value").alias("Value"))
        .join(F.broadcast(parent_labels), "parent", "left")
        .filter(F.col("Year").isNotNull())
        .select(
            F.when(F.col("Parent_Label") == "World", F.lit("0000"))
            .otherwise(F.col("parent"))
            .alias("Economy_Code"),
            F.col("Parent_Label").alias("Economy_Label"),
            "Year",
            "Variable",
            "Value",
        )
    )
    return df.unionByName(groupgdp).orderBy("Economy_Code", "Year", "Variable")


def add_comments(df: DataFrame) -> DataFrame:
    """C11 + C1×7 (``gpd_etl_pipeline.R:415-518``): NULL comment columns
    overwritten by the successor-economy provenance rules."""
    en_rules, fr_rules = [], []
    for code, years, en, fr in COMMENT_RULES:
        mask = F.col("Economy_Code") == code
        if years is not None:
            mask = mask & F.col("Year").between(*years)
        en_rules.append((mask, en))
        fr_rules.append((mask, fr))
    null_str = F.lit(None).cast("string")
    return df.withColumn(
        "CommentEN", conditional_overwrite(null_str, en_rules)
    ).withColumn("CommentFR", conditional_overwrite(null_str, fr_rules))


def export_usis_layout(df: DataFrame, run_date: str | None = None) -> DataFrame:
    """S7 + F5 + P4 + C3 + C6 (``gpd_etl_pipeline.R:525-558``): the
    15-column USIS upload layout over individual economies only."""
    return df.filter(F.length("Economy_Code") < 4).select(
        F.lit("5100").alias("Series"),
        F.col("Economy_Code").alias("Country"),
        F.col("Year"),
        F.lit("A00").alias("Period"),
        F.lit("00").alias("NAComponent"),
        recode(F.col("Variable"), MEASURE_CODES).alias("Measure"),
        F.lit("0101").alias("Source"),
        F.when(F.col("Year") == 2024, F.lit("0001"))          # Internal
        .when(F.col("Economy_Code") == "158", F.lit("3001"))  # National NSO
        .otherwise(F.lit("4809"))                             # UNSD NAMAD
        .alias("DataSource"),
        F.col("Value"),
        F.lit("00").alias("DataStatus"),
        F.lit("0").alias("DataConfidentiality"),
        F.col("CommentEN"),
        F.col("CommentFR"),
        F.lit("0").alias("CommentConfidentiality"),
        ref_date(run_date).alias("RefDate"),
    )


def run_pipeline(
    fact: DataFrame,
    dim_countries: DataFrame,
    labels: DataFrame,
    economy_groups: DataFrame,
    growth_rates: DataFrame | None = None,
    deflators: DataFrame | None = None,
    last_year: int = 2024,
    run_date: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full stage chain (``gpd_etl_pipeline.R:560-571``); returns
    (generic output, USIS layout) as lazy plans — callers pick the sink
    (``io.write_single_csv`` for deliverable parity, parquet for scale)."""
    df = remap_dissolved_economies(fact)
    if growth_rates is not None and deflators is not None:
        df = estimate_last_year(df, growth_rates, deflators, last_year)
    df = round_values(df)
    df = filter_valid_range(df, dim_countries)
    df = add_labels(df, labels)
    df = compute_aggregates(df, economy_groups)
    df = add_comments(df)
    return df, export_usis_layout(df, run_date)
