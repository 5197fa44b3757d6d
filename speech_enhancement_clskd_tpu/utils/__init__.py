from .serialization import (
    CheckpointManager,
    load_bundle,
    save_bundle,
    student_from_state,
)
