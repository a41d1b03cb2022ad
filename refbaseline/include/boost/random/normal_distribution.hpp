#pragma once
#include <random>

namespace boost { namespace random {
template <class RealType = double>
using normal_distribution = std::normal_distribution<RealType>;
}}
