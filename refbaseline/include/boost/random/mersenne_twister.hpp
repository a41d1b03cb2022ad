#pragma once
#include <random>

namespace boost { namespace random {
using mt19937 = std::mt19937;
}}
