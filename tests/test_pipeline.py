"""End-to-end pipeline test: the reference's seven stages over
synthetic org-chart + HTML fixtures, finishing with the derived-edge
graph — the ``main.py`` + ``mysql2neo4j.py`` workflow in one pass."""

from __future__ import annotations

from leader_graph_spark.pipeline.stages import (
    build_graph,
    derive_leaders,
    extract_leader_details,
    extract_org_fields,
    ingest_orgs,
    structure_careers,
)


def _person_html(native_place: str) -> str:
    return (
        "<html><body><dl><dt>民族</dt><dd>汉族</dd>"
        f"<dt>籍贯</dt><dd>{native_place}</dd></dl></body></html>"
    )


def _org_html(names: list[str]) -> str:
    links = "".join(f'<li><a href="/item/{n}">{n}</a></li>' for n in names)
    return f"<html><body><h2>机构领导</h2><ul>{links}</ul></body></html>"


def _career(lines: list[str]) -> str:
    return "\n".join(lines)


def test_full_pipeline(spark):
    # Stage 1: ingest with forward-fill + dedup
    raw = spark.createDataFrame(
        [
            (1, "省政府", "财政厅", "http://a"),
            (2, "", "教育厅", "http://b"),        # parent forward-filled
            (3, "/", "财政厅", "http://a"),       # duplicate uuid → dropped
            (4, "市政府", "财政局", "http://c"),
        ],
        "row_seq int, parent_dept string, dept string, url string",
    )
    orgs = ingest_orgs(raw)
    rows = {r.dept: r for r in orgs.collect()}
    assert len(rows) == 3
    assert rows["教育厅"].parent_dept == "省政府"  # forward-filled
    assert rows["财政厅"].parent_dept == "省政府"  # first occurrence won

    # Stages 2-4: landing HTML → org fields + derived leaders
    org_pages = orgs.limit(2)
    html_by_dept = {
        "财政厅": _org_html(["张三", "李四"]),
        "教育厅": _org_html(["王五"]),
        "财政局": _org_html([]),
    }
    pages = spark.createDataFrame(
        [(r.uuid, html_by_dept[r.dept]) for r in orgs.collect()],
        "uuid string, remark string",
    )
    fields = extract_org_fields(pages)
    assert fields.count() == 3
    leaders = derive_leaders(pages)
    got = {(r.name) for r in leaders.collect()}
    assert got == {"张三", "李四", "王五"}
    assert leaders.select("uuid").distinct().count() == 3

    # incremental rerun: everything already done → empty
    assert derive_leaders(pages, done=leaders.select("uuid")).count() == 0

    # Stages 5-7: careers → validated events
    careers = {
        "张三": _career(["1980.09-1984.07 北京大学学习", "1984.07-1990.01 财政厅工作"]),
        "李四": _career(["1981.09-1985.07 北京大学学习", "1985.01-1992.06 财政厅工作"]),
        "王五": _career(["2000.01-今 教育厅工作"]),
    }
    cdf = spark.createDataFrame(
        [(r.uuid, r.org_uuid, r.name, careers[r.name]) for r in leaders.collect()],
        "uuid string, org_uuid string, name string, career_text string",
    )
    valid, quarantine = structure_careers(cdf)
    events = valid.collect()
    assert {(e.event_type) for e in events} == {"study", "work"}
    studies = [e for e in events if e.event_type == "study"]
    assert all(e.school for e in studies)

    # Stage 6b: person-details infobox → native_place (feeds SAME_HOMETOWN)
    places = {"张三": "山东济南", "李四": "山东济南", "王五": "浙江杭州"}
    leader_pages = spark.createDataFrame(
        [(r.uuid, _person_html(places[r.name])) for r in leaders.collect()],
        "uuid string, remark string",
    )
    details = extract_leader_details(leader_pages)
    assert {r.native_place for r in details.collect()} == {"山东济南", "浙江杭州"}

    # Graph build: schoolmates through the shared 北京大学 interval overlap
    graph = build_graph(orgs, cdf, valid, person_details=details)
    mates = graph["schoolmates"].collect()
    assert len(mates) == 1
    m = mates[0]
    assert m.at_same_time is True
    # overlap of 1980.09-1984.07 and 1981.09-1985.07 → 1981.09-1984.07
    assert m.overlap_period == "1981.09-1984.07"
    assert graph["vertices"].count() == 6  # 3 orgs + 3 people
    assert graph["edges"].filter("relationship = 'WORKS_FOR'").count() == 3
    colleagues = graph["colleagues_now"].collect()
    assert all(c.overlap_period == "till now" for c in colleagues)
    assert len(colleagues) == 1  # 张三-李四 share the 财政厅 org
    # J6 historical colleagues: 张三 1984.07-1990.01 × 李四 1985.01-1992.06
    # at the same workplace; 王五's open-ended event (null end) is excluded.
    past = graph["colleagues_past"].collect()
    assert len(past) == 1
    assert past[0].overlap_period == "1985.01-1990.01"
    # J3 SAME_HOMETOWN: 张三-李四 share 山东济南; 王五 alone in his group.
    hometown = graph["same_hometown"].collect()
    assert len(hometown) == 1
    assert hometown[0].native_place == "山东济南"
