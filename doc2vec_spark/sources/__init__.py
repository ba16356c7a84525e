"""Source connectors (SURVEY 2.1).

Spark-first mapping of the reference's six source types (types.ts:3):
local_directory/code -> binaryFile scans (local.py); website -> BFS frontier
loop (crawler.py) + sitemap seeding (sitemap.py); github/zendesk -> paginated
REST fetch layer (rest.py); s3 -> the same binaryFile scan on s3a:// (s3.py).
"""
