#pragma once
namespace boost { namespace interprocess {}}
