"""Markdown mining edges: frontmatter scalar subset, heading levels
vs in-code '#' lines, fence info strings and line counts, inline
links/images, code-excluded word counts, pure-Catalyst plan."""
import pandas as pd
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.markdown import (
    md_code_blocks,
    md_frontmatter,
    md_headings,
    md_links,
    md_stats,
)

DOC = """---
title: "My Doc"
lang: en
tags:
  - nested
count: 7
---
# Main Title

Some prose with a [link](https://x.org/a "t") and ![img](https://x.org/i.png).

## Section One

```python
# not a heading
print("hi")
```

More words here.

```
bare block
```
"""


def _row(spark, md):
    df = spark.createDataFrame(pd.DataFrame({"md": [md]}))
    return df.select(
        md_frontmatter(F.col("md")).alias("fm"),
        md_headings(F.col("md")).alias("h"),
        md_code_blocks(F.col("md")).alias("c"),
        md_links(F.col("md")).alias("l"),
        md_stats(F.col("md")).alias("s"),
    ).collect()[0]


def test_structure_mining(spark):
    r = _row(spark, DOC)
    assert dict(r.fm) == {"title": "My Doc", "lang": "en", "count": "7"}
    assert [(h.level, h.text) for h in r.h] == [
        (1, "Main Title"), (2, "Section One")]
    assert [(c.lang, c.n_lines) for c in r.c] == [("python", 2), ("", 1)]
    assert [(x.text, x.url) for x in r.l] == [
        ("link", "https://x.org/a"), ("img", "https://x.org/i.png")]
    assert r.s.n_headings == 2 and r.s.n_code_blocks == 2
    assert r.s.code_lines == 3 and r.s.n_links == 2


def test_no_frontmatter_and_empty(spark):
    r = _row(spark, "just words, no structure")
    assert dict(r.fm) == {} and list(r.h) == [] and list(r.c) == []
    assert r.s.prose_words == 4
    r = _row(spark, "")
    assert r.s.prose_words == 0 and r.s.n_headings == 0


def test_frontmatter_requires_leading_fence(spark):
    # a '---' later in the document is a horizontal rule, not
    # frontmatter
    r = _row(spark, "intro\n---\ntitle: nope\n---\n")
    assert dict(r.fm) == {}


def test_heading_inside_code_not_counted(spark):
    md = "```sh\n# comment line\n```\n# Real Heading\n"
    r = _row(spark, md)
    assert [(h.level, h.text) for h in r.h] == [(1, "Real Heading")]


def test_pure_catalyst(spark):
    df = spark.createDataFrame(pd.DataFrame({"md": [DOC]}))
    plan = df.select(
        md_stats(F.col("md")).alias("s")
    )._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "EvalPython" not in plan
