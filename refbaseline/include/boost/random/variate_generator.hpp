#pragma once
// Included by cnF2freq.cpp but never instantiated at HEAD.
