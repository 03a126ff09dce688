"""HTML structured-table harvest (stages/htmltables.py) — contract
pins: colspan slot math, header flag, empty cells kept, entity
unescape + whitespace collapse, uppercase tags, nested-table stand-in,
soft-fail on undecodable bytes."""

from __future__ import annotations


def _cells(rows, ray_session=None):
    import ray.data as rd

    from pappermate_ray.stages.htmltables import html_tables

    out = html_tables(rd.from_items(rows)).take_all()
    return [(r["table_id"], r["row_id"], r["col_id"], r["is_header"],
             r["cell"]) for r in out]


def test_grid_colspan_and_header(ray_session):
    html = (b"<html><body><table>"
            b"<tr><th>A</th><th>B</th><th>C</th></tr>"
            b'<tr><td colspan="2">wide</td><td>c2</td></tr>'
            b"<tr><td>x</td><td></td><td>z</td></tr>"
            b"</table></body></html>")
    got = _cells([{"url": "u", "html": html}])
    assert got == [
        (0, 0, 0, True, "A"), (0, 0, 1, True, "B"), (0, 0, 2, True, "C"),
        (0, 1, 0, False, "wide"), (0, 1, 2, False, "c2"),
        (0, 2, 0, False, "x"), (0, 2, 1, False, ""),  # empty cell kept
        (0, 2, 2, False, "z"),
    ]


def test_uppercase_tags_entities_and_collapse(ray_session):
    html = (b"<TABLE><TR><TH>  A &amp;\n B  </TH>"
            b"<TD><b>bold</b> tail</TD></TR></TABLE>")
    got = _cells([{"url": "u", "html": html}])
    assert got == [(0, 0, 0, True, "A & B"), (0, 0, 1, False, "bold tail")]


def test_multiple_tables_and_rowspan_ignored(ray_session):
    html = (b'<table><tr><td rowspan="2">r</td><td>b</td></tr>'
            b"<tr><td>c</td></tr></table>"
            b"<table><tr><td>second</td></tr></table>")
    got = _cells([{"url": "u", "html": html}])
    # rowspan does not reserve a slot on the next row (documented)
    assert got == [(0, 0, 0, False, "r"), (0, 0, 1, False, "b"),
                   (0, 1, 0, False, "c"), (1, 0, 0, False, "second")]


def test_nested_table_surfaces_as_outer_text(ray_session):
    html = (b"<table><tr><td>out "
            b"<table><tr><td>in</td></tr></table></td></tr></table>")
    got = _cells([{"url": "u", "html": html}])
    # non-recursive scan: the outer table match ends at the FIRST
    # </table>, so the outer cell carries the inner text tag-stripped
    assert got == [(0, 0, 0, False, "out in")]


def test_soft_fail_and_tableless_pages(ray_session):
    got = _cells([
        {"url": "a", "html": b"\xff\xfe<table><tr><td>k</td></tr></table>"},
        {"url": "b", "html": b"<html><body>no tables</body></html>"},
        {"url": "c", "html": b""},
    ])
    assert got == [(0, 0, 0, False, "k")]
