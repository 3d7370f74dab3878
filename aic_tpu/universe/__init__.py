"""Layer 1e: Universe container, transactions, operations, behaviors, step loop."""

from .op import (
    AddModifiers,
    Alt,
    Become,
    DestroyTo,
    MoveInwards,
    Neighbors,
    Operation,
    OperationFailed,
    StartMove,
    TakeInventory,
)
from .transaction import (
    CubeEdit,
    PreconditionFailed,
    SpaceTransaction,
    TransactionConflict,
    UniverseTransaction,
)
from .cursor import (
    Activate,
    CopyFromSpace,
    Cursor,
    CustomTool,
    Inventory,
    InventoryConflict,
    InventoryTransaction,
    PlaceBlock,
    RemoveBlock,
    Stack,
    Tool,
    click,
    cursor_raycast,
    free_editing_inventory,
    stack_limit,
)
from .universe import Behavior, Character, Clock, Tick, Universe, UniverseStepInfo

__all__ = [
    "AddModifiers", "Alt", "Become", "DestroyTo", "MoveInwards",
    "Neighbors", "Operation", "StartMove", "TakeInventory",
    "OperationFailed", "CubeEdit", "PreconditionFailed", "SpaceTransaction",
    "TransactionConflict", "UniverseTransaction", "Behavior", "Character",
    "Clock", "Tick", "Universe", "UniverseStepInfo",
    "Activate", "CopyFromSpace", "Cursor", "CustomTool", "Inventory",
    "InventoryConflict", "InventoryTransaction", "PlaceBlock",
    "RemoveBlock", "Stack", "Tool", "click", "cursor_raycast",
    "free_editing_inventory", "stack_limit",
]
