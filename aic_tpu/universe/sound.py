"""Synthesized sound definitions (reference: all-is-cubes/src/sound/).

`SoundDef` describes a short synthesized waveform (the reference's
universe members of the same name); `synthesize` renders it to f32 PCM
on host, and `fluff_sound_map` gives frontends the fluff-name → SoundDef
mapping they play back (desktop audio.rs's kira glue is the consumer
role; our frontends receive raw PCM).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class SoundDef:
    """A synthesized tone: oscillator + envelope (sound/def)."""

    waveform: str = "sine"  # "sine" | "square" | "saw" | "noise"
    frequency: float = 440.0
    duration: float = 0.08  # seconds
    amplitude: float = 0.3
    decay: float = 30.0  # exponential amplitude decay rate (1/s)


def synthesize(sound: SoundDef, sample_rate: int = 44100) -> np.ndarray:
    """Render to mono f32 PCM in [-1, 1]."""
    n = max(int(sound.duration * sample_rate), 1)
    t = np.arange(n) / sample_rate
    phase = t * sound.frequency
    if sound.waveform == "square":
        osc = np.sign(np.sin(2 * np.pi * phase))
    elif sound.waveform == "saw":
        osc = 2.0 * (phase - np.floor(phase + 0.5))
    elif sound.waveform == "noise":
        osc = np.random.default_rng(0).uniform(-1, 1, n)
    else:
        osc = np.sin(2 * np.pi * phase)
    envelope = np.exp(-sound.decay * t)
    return (sound.amplitude * envelope * osc).astype(np.float32)


#: Default fluff-name → sound mapping (the sounds content installs;
#: fluff.rs's standard effects like BlockPlaced/BlockDestroyed).
DEFAULT_SOUNDS = {
    "Place": SoundDef(waveform="square", frequency=660.0, duration=0.06),
    "Destroy": SoundDef(waveform="noise", frequency=0.0, duration=0.09),
    "Activate": SoundDef(waveform="sine", frequency=880.0, duration=0.05),
    "Step": SoundDef(waveform="noise", frequency=0.0, duration=0.03, amplitude=0.12),
    "Happened": SoundDef(),
}


def fluff_sound_map() -> dict:
    return dict(DEFAULT_SOUNDS)
