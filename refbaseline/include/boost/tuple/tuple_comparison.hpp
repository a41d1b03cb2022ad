#pragma once
#include <boost/tuple/tuple.hpp>
