"""Fixed, explicit StructType schemas for the engine's reference-shaped tables.

The reference infers every schema dynamically (pd.DataFrame at
fetch_youtube_data.py:71,:136; to_sql DDL inference at :194,:198). The engine
inverts that: schemas are pinned here, and nullability encodes exactly which
reference fields were read with ``.get()`` (nullable) versus hard ``[...]``
access (non-null). See FIXTURES.md for the rationale per column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# channels_raw — API-shaped channel rows, post-projection
# (fetch_youtube_data.py:62-68). Counter columns stay strings on purpose:
# the YouTube API returns statistics counts as JSON strings and the reference
# never casts them (SURVEY.md §2.6 item 6); the curated view adds the casts.
CHANNELS_RAW = T.StructType(
    [
        T.StructField("channel_title", T.StringType(), False),
        T.StructField("published_date", T.StringType(), False),  # never parsed (:63)
        T.StructField("country", T.StringType(), True),  # .get() at :64
        T.StructField("subscribers", T.StringType(), False),
        T.StructField("views", T.StringType(), False),
        T.StructField("totalVideos", T.StringType(), False),
        T.StructField("playlistId", T.StringType(), False),
    ]
)

# playlist_items_raw — (playlist, video) membership emitted by the paginated
# scan (fetch_youtube_data.py:86-100). page_index is synthetic provenance.
PLAYLIST_ITEMS_RAW = T.StructType(
    [
        T.StructField("playlistId", T.StringType(), False),
        T.StructField("videoId", T.StringType(), False),
        T.StructField("page_index", T.IntegerType(), False),
    ]
)

# videos_raw — the exact 11-column pre-transform shape built at
# fetch_youtube_data.py:122-133 (everything below videoId uses .get()).
VIDEOS_RAW = T.StructType(
    [
        T.StructField("videoId", T.StringType(), False),
        T.StructField("channel", T.StringType(), True),
        T.StructField("video_title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("publishedAt", T.StringType(), True),
        T.StructField("likes", T.StringType(), True),
        T.StructField("views", T.StringType(), True),
        T.StructField("comments", T.StringType(), True),
        T.StructField("favourites", T.StringType(), True),
        T.StructField("duration", T.StringType(), True),
    ]
)

# video_stats — the 19-column enriched output, column order as materialized
# by the reference write (fetch_youtube_data.py:194; FIXTURES.md §5).
VIDEO_STATS = T.StructType(
    [
        T.StructField("videoId", T.StringType(), False),
        T.StructField("channel", T.StringType(), True),
        T.StructField("video_title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("publishedAt", T.TimestampType(), True),
        T.StructField("likes", T.LongType(), True),
        T.StructField("views", T.LongType(), True),  # NULL policy per SURVEY §2.6 item 4
        T.StructField("comments", T.LongType(), True),
        T.StructField("favourites", T.LongType(), True),
        T.StructField("duration", T.StringType(), True),
        T.StructField("tag_count", T.IntegerType(), False),
        T.StructField("description_length", T.IntegerType(), False),
        T.StructField("publish_year", T.IntegerType(), True),
        T.StructField("publish_time", T.StringType(), True),
        T.StructField("published_dayofweek", T.StringType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("comment_view_ratio", T.DoubleType(), True),
        T.StructField("like_view_ratio", T.DoubleType(), True),
    ]
)

# channel_stats — identical to channels_raw (reference writes it unchanged,
# overwrite mode, fetch_youtube_data.py:198).
CHANNEL_STATS = CHANNELS_RAW
