"""The reference ETL pipeline re-expressed as lazy DataFrame stages.

``gdp``     — the main pipeline (``gpd_etl_pipeline.R:560-571``):
              melt → remap → estimate → round → band-filter → label →
              hierarchy rollup → comments → export.
``compare`` — the release-diff job (``gdp_compare_with_old_data.R``).
``qa``      — the four bookdown QA queries (chapters 04-08).
"""
