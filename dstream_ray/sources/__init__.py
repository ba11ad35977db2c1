from dstream_ray.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    derive_transcripts,
    generate_transcripts,
    read_transcript_feed,
    transcripts_dataset,
)
