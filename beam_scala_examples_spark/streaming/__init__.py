"""Structured Streaming twins of the reference's streaming pipelines
(SURVEY §2.7/§2.8): watermark-driven windowed aggregation (LeaderBoard),
keyed threshold state (StatefulTeamScore), pane-timing emulation
(TriggerExample), session re-windowing (GameStats), and the file-feed
test source standing in for Pub/Sub (S10).
"""
