"""Deterministic messy-data synthesis — reference-shaped inputs built
FROM the fixture tables (FIXTURES.md §2), so Spark and the DuckDB
oracle construct bit-identical messy strings.

Discipline: INTEGER-only string building (cast/lpad/concat of ints) —
float→string formatting differs between engines; integer formatting
does not. The money/runtime snippets are dialect-neutral (valid Spark
SQL and DuckDB); dates need per-dialect format strings.
"""

MONEY_SYNTH = """
    CASE o_orderkey % 6
      WHEN 0 THEN '$' || cast(o_orderkey % 900 + 100 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' million'
      WHEN 1 THEN '$' || cast(o_orderkey % 9 + 1 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' billion'
      WHEN 2 THEN '$' || cast(o_orderkey % 900 + 100 as string)
                  || ',' || lpad(cast((o_orderkey * 7) % 1000 as string), 3, '0')
                  || ',' || lpad(cast((o_orderkey * 13) % 1000 as string), 3, '0')
      WHEN 3 THEN '$' || cast(o_orderkey % 8 + 1 as string)
                  || '.' || cast(o_orderkey % 10 as string)
                  || '-' || cast(o_orderkey % 8 + 2 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' million'
      WHEN 4 THEN '$' || cast(o_orderkey % 900 + 100 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' million['
                  || cast(o_orderkey % 25 + 1 as string) || ']'
      ELSE 'N/A'
    END
"""

DATE_SYNTH_SPARK = """
    CASE o_orderkey % 4
      WHEN 0 THEN date_format(o_orderdate, 'MMMM d, yyyy')
      WHEN 1 THEN date_format(o_orderdate, 'yyyy-MM-dd')
      WHEN 2 THEN date_format(o_orderdate, 'MMMM yyyy')
      ELSE date_format(o_orderdate, 'yyyy')
    END
"""

DATE_SYNTH_DUCK = """
    CASE o_orderkey % 4
      WHEN 0 THEN strftime(o_orderdate, '%B %-d, %Y')
      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
      WHEN 2 THEN strftime(o_orderdate, '%B %Y')
      ELSE strftime(o_orderdate, '%Y')
    END
"""

RUNTIME_SYNTH = """
    CASE o_orderkey % 3
      WHEN 0 THEN cast(o_orderkey % 4 + 1 as string) || 'h '
                  || cast(o_orderkey % 60 as string) || 'm'
      WHEN 1 THEN cast(o_orderkey % 240 as string) || ' m'
      ELSE 'unknown'
    END
"""

# imdb-style link derived from the order key (q_regex_extract + flagship)
IMDB_URL_SYNTH = """
    'https://www.imdb.com/title/tt'
      || lpad(cast(o_orderkey % 10000000 as string), 7, '0') || '/'
"""

# wiki-side editorial columns for the flagship pipeline
DIRECTOR_SYNTH = """
    CASE WHEN o_orderkey % 89 = 0 THEN NULL
         ELSE 'Director ' || cast(o_orderkey % 50 as string) END
"""

EPISODES_SYNTH = """
    CASE WHEN o_orderkey % 97 = 0 THEN o_orderkey % 12 + 1 ELSE NULL END
"""
