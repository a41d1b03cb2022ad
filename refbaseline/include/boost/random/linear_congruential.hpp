#pragma once
#include <random>

namespace boost { namespace random {
using minstd_rand = std::minstd_rand;
using minstd_rand0 = std::minstd_rand0;
}}
