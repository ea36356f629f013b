from scx.tools.editor import (
    EditorDocument,
    EditorEntity,
    CommandStack,
    PlaceCommand,
    DeleteCommand,
    TransformCommand,
    SetPropertyCommand,
    pick_entity,
    make_pick_ray,
    FlyCamera,
    translate_gizmo_drag,
)
from scx.tools.asset_db import AssetDatabase, AssetKind
