#pragma once
// All spirit x3 grammar code is excised by the refbaseline patch; only the
// namespaces must exist for the remaining using-directives.
namespace boost { namespace spirit { namespace x3 {}}}
