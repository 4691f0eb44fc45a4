"""End-to-end pipelines mirroring the reference's cron DAG (SURVEY.md §3):

    transcribe_council → summarize → get_box_links → vectorize   (council)
    newscrawler → article_vectorize                              (articles)

Each pipeline is a composition of the operator library — one lazy DataFrame
plan per stage, no driver-side loops — demonstrating that a user of the
reference can run their whole workload on this engine.
"""
