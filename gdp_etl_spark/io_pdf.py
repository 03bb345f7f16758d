"""S8: per-economy comparison plots to PDF — the reference's last
deliverable (``gdp_compare_with_old_data.R:54-90``): for every economy,
line charts of old vs new release values per variable, 3 charts per
page, one multi-page PDF.

Implemented as a MINIMAL dependency-free PDF 1.4 writer (public
ISO 32000 / Adobe spec): pages, a built-in Helvetica font, polyline
graphics operators (``m``/``l``/``S``), RGB strokes, dash patterns for
the linetype dimension, and a correct xref table.  No matplotlib/
reportlab — the chart grammar the reference gets from ggplot reduces
here to scaled polylines + axis box + labels, which is all the
deliverable needs.

Reference visual contract honored: old release ``#FBAF17`` (orange) vs
new ``#009EDB`` (blue) (``:82``), linetype distinguishes the variable
(``aes(linetype=Variable)``), title = economy label, y label USD,
3 rows per page (``marrangeGrob nrow=3``), economies in sorted order
(``:87``).

Scale note: this is a REPORT SINK — the input is the release-diff
frame collapsed to (economy, year, variable, old, new) annual series,
thousands of rows total, and the reference collects exactly the same
data into ggplot.  The collect here is bounded by the report size, not
the data scale; the heavy lifting (the diff) stays distributed in
``plans.compare``.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame

#: reference palette (gdp_compare_with_old_data.R:82)
_OLD_RGB = (0xFB / 255, 0xAF / 255, 0x17 / 255)
_NEW_RGB = (0x00 / 255, 0x9E / 255, 0xDB / 255)

_PAGE_W, _PAGE_H = 612, 792          # US Letter, like ggsave 8x12in
_CHARTS_PER_PAGE = 3

#: (PDF dash operator, legend name) per variable index, cycled
_DASHES = (
    ("[] 0 d", "solid"),
    ("[4 3] 0 d", "dashed"),
    ("[1 2] 0 d", "dotted"),
    ("[6 2 1 2] 0 d", "dash-dot"),
)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class _PdfWriter:
    """Just enough of ISO 32000: sequential objects, page tree, one
    built-in font, content streams, xref + trailer."""

    def __init__(self) -> None:
        self.objects: list[bytes] = []     # bodies, 1-indexed ids

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def render(self, catalog_id: int) -> bytes:
        out = bytearray(b"%PDF-1.4\n")
        offsets = [0] * (len(self.objects) + 1)
        for i, body in enumerate(self.objects, start=1):
            offsets[i] = len(out)
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        n = len(self.objects) + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for i in range(1, n):
            out += f"{offsets[i]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {n} /Root {catalog_id} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)


def _chart_stream(
    title: str,
    series: dict[tuple[str, str], list[tuple[float, float]]],
    x0: float,
    y0: float,
    w: float,
    h: float,
) -> str:
    """One chart's graphics: axis box, title, min/max labels, and a
    polyline per (release, variable) series scaled into the box."""
    pts = [p for s in series.values() for p in s]
    if not pts:
        return ""
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts if p[1] is not None]
    if not ys:
        return ""
    xmin, xmax = min(xs), max(xs)
    ymin, ymax = min(ys), max(ys)
    xspan = (xmax - xmin) or 1.0
    yspan = (ymax - ymin) or 1.0

    def sx(x: float) -> float:
        return x0 + (x - xmin) / xspan * w

    def sy(y: float) -> float:
        return y0 + (y - ymin) / yspan * h

    ops = [
        # axis box
        f"0.3 0.3 0.3 RG 0.5 w {x0:.1f} {y0:.1f} {w:.1f} {h:.1f} re S",
        # title + axis labels (Helvetica)
        f"BT /F1 11 Tf {x0:.1f} {y0 + h + 6:.1f} Td ({_esc(title)}) Tj ET",
        f"BT /F1 7 Tf {x0:.1f} {y0 - 9:.1f} Td ({int(xmin)}) Tj ET",
        f"BT /F1 7 Tf {x0 + w - 20:.1f} {y0 - 9:.1f} Td ({int(xmax)}) Tj ET",
        f"BT /F1 7 Tf {x0 - 4:.1f} {y0 + h + 6:.1f} Td (USD) Tj ET",
        f"BT /F1 7 Tf {x0 - 4:.1f} {y0 - 9:.1f} Td ({ymin:.3g}) Tj ET",
    ]
    variables = sorted({v for (_, v) in series})
    for (release, variable), points in sorted(series.items()):
        rgb = _OLD_RGB if release == "old" else _NEW_RGB
        # linetype dimension (ggplot aes(linetype=Variable)): a distinct
        # dash per variable index, cycling for >len(_DASHES) variables
        vi = variables.index(variable)
        dash = _DASHES[vi % len(_DASHES)][0]
        clean = [(x, y) for x, y in sorted(points) if y is not None]
        if len(clean) < 2:
            continue
        path = f"{sx(clean[0][0]):.2f} {sy(clean[0][1]):.2f} m " + " ".join(
            f"{sx(x):.2f} {sy(y):.2f} l" for x, y in clean[1:]
        )
        ops.append(
            f"{rgb[0]:.3f} {rgb[1]:.3f} {rgb[2]:.3f} RG 1.2 w {dash} "
            f"{path} S"
        )
    # legend line (bottom, like guide_legend(position="bottom")):
    # name every variable with its actual linetype
    legend_vars = "; ".join(
        f"{_DASHES[i % len(_DASHES)][1]} = {_esc(v[:32])}"
        for i, v in enumerate(variables)
    )
    ops.append(
        f"BT /F1 7 Tf {x0:.1f} {y0 - 18:.1f} Td "
        f"(old = orange, new = blue; {legend_vars}) Tj ET"
    )
    return "\n".join(ops)


def write_comparison_pdf(
    diff: DataFrame,
    path: str,
    label_col: str = "Economy_Label",
    year_col: str = "Year",
    variable_col: str = "Variable",
    old_col: str = "value_old",
    new_col: str = "value_new",
    max_economies: int = 2000,
) -> int:
    """Render the release-diff frame to the reference's comparison PDF
    (one chart per economy, 3 per page, sorted by label).  Returns the
    number of economies plotted.

    ``max_economies`` bounds the driver-side collect — the report is a
    per-economy artifact (~300 economies × ~55 years × 2 variables in
    the reference), far below data scale.  The bound is checked with a
    distinct-count BEFORE collecting any rows, so a mistakenly
    un-aggregated frame raises instead of OOMing the driver.  Rows with
    a NULL label or NULL year carry no plottable point and are skipped
    (release_diff coalesces new-economy labels from the code, so
    'added economy' charts are NOT lost — see
    ``plans.compare.export_comparison_pdf``).
    """
    from pyspark.sql import functions as F

    # guard and collect must see the SAME frame: counting before the
    # NULL-label filter would let unplottable NULL-label rows trip the
    # bound for a report that actually fits
    plottable = diff.select(
        label_col, year_col, variable_col, old_col, new_col
    ).filter(F.col(label_col).isNotNull() & F.col(year_col).isNotNull())
    n_labels = plottable.select(label_col).distinct().count()
    if n_labels > max_economies:
        raise ValueError(
            f"{n_labels} economies exceeds max_economies="
            f"{max_economies}; filter the diff or raise the bound"
        )
    rows = plottable.collect()
    by_economy: dict[str, dict[tuple[str, str], list]] = defaultdict(
        lambda: defaultdict(list)
    )
    for r in rows:
        label = r[label_col]
        year = r[year_col]
        var = str(r[variable_col])
        by_economy[label]  # register even if every value is NULL: the
        # reference renders an all-NA economy as an empty titled chart
        # (R's plot loop iterates every old label,
        # ``gdp_compare_with_old_data.R:88``), and page-count parity
        # with its published PDF depends on it
        if r[old_col] is not None:
            by_economy[label][("old", var)].append((year, float(r[old_col])))
        if r[new_col] is not None:
            by_economy[label][("new", var)].append((year, float(r[new_col])))
    economies = sorted(by_economy)
    if not economies:
        raise ValueError("diff produced no economies to plot")

    pdf = _PdfWriter()
    catalog_id = pdf.add(b"")          # patched below (needs Pages id)
    pages_id = pdf.add(b"")            # patched below (needs kid ids)
    font_id = pdf.add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    page_ids: list[int] = []
    margin, gap = 50, 40
    chart_h = (_PAGE_H - 2 * margin - (_CHARTS_PER_PAGE - 1) * gap) / _CHARTS_PER_PAGE
    chart_w = _PAGE_W - 2 * margin
    for start in range(0, len(economies), _CHARTS_PER_PAGE):
        chunk = economies[start:start + _CHARTS_PER_PAGE]
        streams = []
        for slot, label in enumerate(chunk):
            y0 = _PAGE_H - margin - chart_h - slot * (chart_h + gap)
            streams.append(
                _chart_stream(
                    label, by_economy[label], margin, y0, chart_w,
                    chart_h - 20,
                )
            )
        content = "\n".join(s for s in streams if s).encode("latin-1", "replace")
        stream_id = pdf.add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
        page_ids.append(
            pdf.add(
                (
                    f"<< /Type /Page /Parent {pages_id} 0 R "
                    f"/MediaBox [0 0 {_PAGE_W} {_PAGE_H}] "
                    f"/Resources << /Font << /F1 {font_id} 0 R >> >> "
                    f"/Contents {stream_id} 0 R >>"
                ).encode()
            )
        )
    kids = " ".join(f"{i} 0 R" for i in page_ids)
    pdf.objects[pages_id - 1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode()
    )
    pdf.objects[catalog_id - 1] = (
        f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode()
    )
    with open(path, "wb") as f:
        f.write(pdf.render(catalog_id))
    return len(economies)
